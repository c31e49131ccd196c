"""Explicitly-sharded codebook search (shard_map + collectives).

The TPU-native distribution of the LBG hot loop (SURVEY section 5.8):
the codebook shards over the 'model' mesh axis, every device computes
distances of (its copy of) the data against ITS codebook shard, and the
global argmin combines with an argmin-over-(min, index) trick: pmin of
packed (distance, global_index) keys.  Data simultaneously shards over
'data', so an (N, E) search uses the whole mesh.

This is the hand-written collective counterpart of the GSPMD path in
fpsc_tpu.quant.lbg (which lets XLA insert the collectives); both are
tested equal.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fpsc_tpu.quant.lbg import pairwise_sq_dist


def sharded_find_nearest(mesh: Mesh, data: jax.Array,
                         codebook: jax.Array) -> jax.Array:
    """data (N, D) sharded over 'data'; codebook (E, D) sharded over
    'model'.  Returns global nearest-entry indices (N,) int32."""
    n_model = mesh.shape["model"]
    e = codebook.shape[0]
    shard_e = e // n_model

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("data", None), P("model", None)),
        out_specs=P("data"),
    )
    def search(x, cb_shard):
        # local distances against this device's codebook shard
        d = pairwise_sq_dist(x, cb_shard)              # (n_loc, shard_e)
        local_idx = jnp.argmin(d, axis=1)
        local_min = jnp.min(d, axis=1)
        offset = jax.lax.axis_index("model") * shard_e
        global_idx = local_idx.astype(jnp.int32) + offset
        # combine across the model axis: min distance wins, ties to the
        # LOWEST global index (matching single-device argmin semantics)
        neg_idx = -global_idx.astype(jnp.float32)
        best_min = jax.lax.pmin(local_min, "model")
        is_best = local_min == best_min
        masked = jnp.where(is_best, neg_idx, -jnp.inf)
        winner = -jax.lax.pmax(masked, "model")
        return winner.astype(jnp.int32)

    return search(data, codebook)


def sharded_kmeans_update(mesh: Mesh, data: jax.Array,
                          codebook: jax.Array):
    """One k-means step with entry-sharded codebook + data-sharded
    points: local partial sums psum over 'data', then each shard
    updates its own entries."""
    n_model = mesh.shape["model"]
    e = codebook.shape[0]
    shard_e = e // n_model

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("data", None), P("model", None)),
        out_specs=(P("model", None), P("model")),
    )
    def update(x, cb_shard):
        # need global assignment: gather the full codebook over 'model'
        cb_full = jax.lax.all_gather(cb_shard, "model", tiled=True)
        d = pairwise_sq_dist(x, cb_full)
        idx = jnp.argmin(d, axis=1)
        counts = jnp.zeros((e,), jnp.float32).at[idx].add(1.0)
        sums = jnp.zeros((e, x.shape[1]), x.dtype).at[idx].add(x)
        counts = jax.lax.psum(counts, "data")
        sums = jax.lax.psum(sums, "data")
        me = jax.lax.axis_index("model")
        sl = jax.lax.dynamic_slice_in_dim(sums, me * shard_e, shard_e, 0)
        cl = jax.lax.dynamic_slice_in_dim(counts, me * shard_e, shard_e, 0)
        return sl / (cl[:, None] + 1e-20), cl

    return update(data, codebook)


def shard_arrays(mesh: Mesh, data, codebook):
    data = jax.device_put(data, NamedSharding(mesh, P("data", None)))
    codebook = jax.device_put(codebook,
                              NamedSharding(mesh, P("model", None)))
    return data, codebook
