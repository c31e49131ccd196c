"""M-best (beam) multi-stage residual vector quantisation.

Semantics match the reference beam search (reference:
src/quantization/vq_func.py:10-131, SURVIVORS=5) including its
tie-breaking, but expressed as a TPU-friendly batched program:

* stage-0: distances to all entries in one matrix op, stable top-k,
* stage-s: the 5 survivor residuals hit the whole stage codebook as a
  single (5, E) distance computation; the reference's insertion-sort
  merge of survivor lists is provably equivalent to taking the top-5 of
  all 5*E candidates under the lexicographic key
  (distance, survivor_rank, entry_index) - a stable merge of sorted
  lists where existing entries win ties.  We sort exactly that key.

The whole search is jittable and vmappable over batches of vectors, so
it can run *inside* the closed-loop frame scan (no host round-trips,
unlike reference src/models/wavernn.py:219-242 which crosses
GPU->CPU->GPU per frame).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

SURVIVORS = 5


def _sq_dist(x: jax.Array, codebook: jax.Array) -> jax.Array:
    """Exact squared distances matching numpy's sum((x-c)**2, -1).

    x: (..., D); codebook: (E, D) -> (..., E).  Computed as an explicit
    squared difference (not the matmul expansion) so that float32
    results - and therefore argmin tie decisions - are bit-identical to
    the reference's numpy broadcasting.
    """
    diff = x[..., None, :] - codebook  # (..., E, D)
    return jnp.sum(diff * diff, axis=-1)


def _stable_topk_min(dist: jax.Array, k: int):
    """Indices/values of k smallest entries, ties to the lowest index."""
    neg = -dist
    vals, idx = jax.lax.top_k(neg, k)
    return idx, -vals


def mbest_search(x: jax.Array, codebooks: Sequence[jax.Array],
                 survivors: int = SURVIVORS):
    """Beam search one vector through all stages.

    x: (D,); codebooks: list of (E_s, D) arrays (static structure).
    Returns (qx (D,), indices (n_stages,) int32) - the best path's
    reconstruction and per-stage entry indices.
    """
    n_stages = len(codebooks)
    cb0 = codebooks[0]
    d0 = _sq_dist(x, cb0)                       # (E0,)
    idx, dist = _stable_topk_min(d0, survivors)  # (S,), (S,)
    # paths: (S, n_stages) entry index per stage, filled so far.
    paths = jnp.zeros((survivors, n_stages), jnp.int32)
    paths = paths.at[:, 0].set(idx)
    recon = cb0[idx]                            # (S, D) partial reconstructions

    for s in range(1, n_stages):
        cb = codebooks[s]
        e = cb.shape[0]
        resid = x[None, :] - recon              # (S, D)
        d = _sq_dist(resid, cb)                 # (S, E)
        # Candidate key: (dist, survivor_rank, entry) lexicographic.
        flat_d = d.reshape(-1)                  # rank-major: k * E + entry
        # lexicographic order == (dist, k*E + entry) because the flat
        # index already orders by (k, entry).
        cand_idx, cand_dist = _stable_topk_min(flat_d, survivors)
        k_sel = cand_idx // e
        e_sel = cand_idx % e
        paths = paths[k_sel].at[:, s].set(e_sel)
        recon = recon[k_sel] + cb[e_sel]
        dist = cand_dist

    return recon[0], paths[0]


def vq_quantize(r: jax.Array, codebooks: Sequence[jax.Array],
                survivors: int = SURVIVORS):
    """Batch quantise r (N, D) through the multi-stage beam.

    Returns (qr (N, D), indices (N, n_stages), counts: list of (E_s,)).
    Equivalent to reference vq_quantize (src/quantization/vq_func.py:134
    -164) including usage counting, minus the per-call np.load.
    """
    search = jax.vmap(lambda v: mbest_search(v, codebooks, survivors))
    qr, idx = search(r)
    counts = [
        jnp.zeros(cb.shape[0], jnp.int32).at[idx[:, s]].add(1)
        for s, cb in enumerate(codebooks)
    ]
    return qr, idx, counts


def vq_dequantize(indices: jax.Array, codebooks: Sequence[jax.Array]) -> jax.Array:
    """indices: (..., n_stages) -> reconstruction (..., D)."""
    out = 0.0
    for s, cb in enumerate(codebooks):
        out = out + cb[indices[..., s]]
    return out
