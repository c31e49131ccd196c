"""Small shared NN primitives (explicit param pytrees)."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DenseParams(NamedTuple):
    w: jax.Array  # (out, in) torch layout
    b: jax.Array  # (out,)


def init_dense(key: jax.Array, in_features: int, out_features: int,
               dtype=jnp.float32) -> DenseParams:
    k = 1.0 / jnp.sqrt(jnp.asarray(in_features, jnp.float32))
    k1, k2 = jax.random.split(key)
    return DenseParams(
        w=jax.random.uniform(k1, (out_features, in_features), dtype, -k, k),
        b=jax.random.uniform(k2, (out_features,), dtype, -k, k),
    )


def dense(params: DenseParams, x: jax.Array) -> jax.Array:
    return jnp.dot(x, params.w.T,
                   preferred_element_type=jnp.float32) + params.b


class EmbeddingParams(NamedTuple):
    table: jax.Array  # (num, dim)


def init_embedding(key: jax.Array, num: int, dim: int,
                   dtype=jnp.float32) -> EmbeddingParams:
    return EmbeddingParams(jax.random.normal(key, (num, dim), dtype))


def embedding(params: EmbeddingParams, idx: jax.Array) -> jax.Array:
    return params.table[idx]


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "size"))
