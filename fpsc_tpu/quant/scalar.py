"""Scalar (1-D) quantisation against a codebook of centers.

TPU-native equivalent of reference src/quantization/vq_func.py:167-185:
nearest-center argmin with usage counting, but batched and jittable
(the reference re-loads the .npy codebook from disk on every call and
loops in Python; here codes live on-device).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def scl_quantize(data: jax.Array, codes: jax.Array):
    """data: (N,) values; codes: (K,) centers.

    Returns (q_data (N,), indices (N,), counts (K,)).
    Ties resolve to the lowest code index (numpy argmin semantics).
    """
    data = data.reshape(-1)
    codes = codes.reshape(-1)
    dist = jnp.square(data[:, None] - codes[None, :])  # (N, K)
    idx = jnp.argmin(dist, axis=1)
    counts = jnp.zeros(codes.shape[0], jnp.int32).at[idx].add(1)
    return codes[idx], idx, counts


def scl_dequantize(indices: jax.Array, codes: jax.Array) -> jax.Array:
    return codes.reshape(-1)[indices]
