"""LBG-style split + k-means codebook training, on-device.

Functional equivalent of the reference's NumPy trainer (reference:
src/quantization/cb_func.py:28-112): start from the data mean, add one
entry at a time (copy of entry 0), perturb all live entries by
.001*U[0,1)/2, run 4 k-means updates, then 10 final updates.  Empty
clusters collapse to the zero vector via the same count+1e-20 division.

TPU-first design:

* the (N, E) assignment runs as ||x||^2 - 2 x.c + ||c||^2 on the MXU,
  with inactive (not yet split) entries masked to +inf so a single
  compiled update serves every codebook size - no per-size
  recompilation for the 1..E growth loop,
* centroid accumulation is a segment-sum (scatter-add), not a Python
  loop over vectors,
* the whole grow loop is ONE fused on-device program (_lbg_fused).

No bespoke Pallas kernel: the assignment is a (5000, 17) x (17, 1024)
matmul + row argmin, which XLA already fuses onto the MXU; the
measured production-size wall time (train_cb geometry, B=5000,
1024+1024 above / 512 below books) is recorded in VALIDATION.md -
the XLA formulation is bandwidth/latency-bound on the scatter, not
MXU-bound, so a hand kernel has nothing left to win.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def pairwise_sq_dist(data: jax.Array, codebook: jax.Array) -> jax.Array:
    """(N, D), (E, D) -> (N, E) squared distances via the MXU expansion.

    precision=HIGHEST is load-bearing: the LBG split perturbations are
    ~1e-4 on O(1) values, far below the bf16 mantissa of the TPU's
    default float32 matmul passes - with default precision all split
    entries alias and the codebook collapses to one live entry.
    """
    x2 = jnp.sum(data * data, axis=1, keepdims=True)          # (N, 1)
    c2 = jnp.sum(codebook * codebook, axis=1)[None, :]        # (1, E)
    xc = jnp.matmul(data, codebook.T,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)       # (N, E)
    return x2 - 2.0 * xc + c2


def find_nearest(data: jax.Array, codebook: jax.Array,
                 n_active: Optional[jax.Array] = None) -> jax.Array:
    """Nearest active entry per row; ties to the lowest entry index.

    `n_active` (scalar int) masks entries >= n_active to +inf so the
    padded codebook can grow without retracing.
    """
    dist = pairwise_sq_dist(data, codebook)
    if n_active is not None:
        live = jnp.arange(codebook.shape[0]) < n_active
        dist = jnp.where(live[None, :], dist, jnp.inf)
    return jnp.argmin(dist, axis=1).astype(jnp.int32)


@partial(jax.jit, donate_argnums=(1,))
def kmeans_update(data: jax.Array, codebook: jax.Array,
                  n_active: jax.Array):
    """One k-means step over the active prefix of a padded codebook.

    Returns (new_codebook, counts).  Matches reference cb_func.update:
    empty clusters become the zero vector (sum 0 / 1e-20).
    """
    e = codebook.shape[0]
    idx = find_nearest(data, codebook, n_active)
    counts = jnp.zeros((e,), jnp.float32).at[idx].add(1.0)
    sums = jnp.zeros_like(codebook).at[idx].add(data)
    new_cb = sums / (counts[:, None] + 1e-20)
    live = (jnp.arange(e) < n_active)[:, None]
    return jnp.where(live, new_cb, codebook), counts


def update(data, codebook, nb_entries, verbose: bool = False):
    """Drop-in analogue of reference cb_func.update on full-size books."""
    cb = jnp.asarray(codebook, jnp.float32)
    new_cb, counts = kmeans_update(jnp.asarray(data, jnp.float32), cb,
                                   jnp.asarray(nb_entries))
    if verbose:
        c = np.asarray(counts[:nb_entries])
        w2 = float(np.sum((c / data.shape[0]) ** 2))
        print(f"{nb_entries} - min: {c.min()}, max: {c.max()}, "
              f"small: {int((c == 0).sum())}, error: {w2}")
    return new_cb


def _kmeans_update_inline(data, codebook, n_active):
    """Un-jitted body shared by the fused trainer (same math as
    kmeans_update, but traceable inside an outer fori_loop)."""
    e = codebook.shape[0]
    idx = find_nearest(data, codebook, n_active)
    counts = jnp.zeros((e,), jnp.float32).at[idx].add(1.0)
    sums = jnp.zeros_like(codebook).at[idx].add(data)
    new_cb = sums / (counts[:, None] + 1e-20)
    live = (jnp.arange(e) < n_active)[:, None]
    return jnp.where(live, new_cb, codebook), counts


@partial(jax.jit, static_argnums=(2, 3, 4))
def _lbg_fused(data, key, nb_entries: int, inner_updates: int,
               final_updates: int):
    """Whole grow-by-one LBG loop as ONE compiled program.

    The reference's trainer (src/quantization/cb_func.py:28-54) runs
    ~4*E k-means updates from a Python loop; over a tunneled TPU each
    dispatch costs ~100ms, so we fuse the entire loop into a single
    lax.fori_loop where split perturbations come from on-device PRNG
    (same .001*U[0,1)/2 distribution, row-masked to the live prefix).
    """
    ndims = data.shape[1]
    cb = jnp.zeros((nb_entries, ndims), jnp.float32)
    cb = cb.at[0].set(jnp.mean(data, axis=0))
    rows = jnp.arange(nb_entries)[:, None]

    def grow_step(e, carry):
        cb, key = carry
        key, sub = jax.random.split(key)
        # codebook[e] = codebook[0]; perturb rows < e.
        cb = jnp.where(rows == e, cb[0][None, :], cb)
        delta = 0.001 * (jax.random.uniform(sub, cb.shape) / 2.0)
        cb = jnp.where(rows < e, cb + delta, cb)

        def upd(_, c):
            c, _cnt = _kmeans_update_inline(data, c, e + 1)
            return c
        cb = jax.lax.fori_loop(0, inner_updates, upd, cb)
        return cb, key

    cb, key = jax.lax.fori_loop(1, nb_entries, grow_step, (cb, key))

    def final(_, c):
        c, _cnt = _kmeans_update_inline(data, c, nb_entries)
        return c
    cb = jax.lax.fori_loop(0, final_updates, final, cb)
    return cb


def vq_train(data: jax.Array, nb_entries: int,
             rng: Optional[np.random.RandomState] = None,
             inner_updates: int = 4, final_updates: int = 10,
             verbose: bool = False,
             seed: int = 0, compat: bool = False) -> jax.Array:
    """Train one stage's codebook with the reference's grow-by-one LBG.

    data: (N, D); returns (nb_entries, D).

    Two modes:
    * fast (default): the entire loop is one fused on-device program;
      split perturbations come from jax PRNG (`seed`).
    * compat=True (or rng given): perturbations come from a seeded
      numpy RandomState in the reference's exact draw order
      (cb_func.py:41), enabling bit-reproduction of its codebooks;
      runs one dispatch per update (slow over a tunneled device).
    """
    if not compat and rng is None:
        return _lbg_fused(jnp.asarray(data, jnp.float32),
                          jax.random.PRNGKey(seed), int(nb_entries),
                          inner_updates, final_updates)

    rng = rng or np.random.RandomState(seed)
    cb = _vq_train_np(np.asarray(data), int(nb_entries), rng,
                      inner_updates, final_updates, verbose)
    return jnp.asarray(cb, jnp.float32)


def _find_nearest_np(data: np.ndarray, codebook: np.ndarray) -> np.ndarray:
    """Reference cb_func.find_nearest arithmetic, chunked over rows."""
    out = np.empty(data.shape[0], np.int64)
    step = max(1, (1 << 22) // max(codebook.size, 1))
    for i in range(0, data.shape[0], step):
        d = np.sum((data[None, i:i + step] - codebook[:, None]) ** 2, -1)
        out[i:i + step] = np.argmin(d, 0)
    return out


def _update_np(data: np.ndarray, codebook: np.ndarray, e: int,
               verbose: bool = False) -> np.ndarray:
    """Reference cb_func.update arithmetic in float64 (empty cells
    become sum 0 / 1e-20 = the zero vector)."""
    idx = _find_nearest_np(data, codebook)
    count = np.zeros((e, 1))
    new_cb = np.zeros((e, data.shape[1]))
    np.add.at(count, idx, 1.0)
    np.add.at(new_cb, idx, data)
    new_cb /= count + 1e-20
    if verbose:
        w2 = float(np.sum((count / data.shape[0]) ** 2))
        print(f"{e} - min: {count.min()}, max: {count.max()}, "
              f"small: {int((count == 0).sum())}, error: {w2}")
    return new_cb


def _vq_train_np(data: np.ndarray, nb_entries: int,
                 rng: np.random.RandomState, inner_updates: int,
                 final_updates: int, verbose: bool) -> np.ndarray:
    """Reference cb_func.vq_train, arithmetic-exact (float64 codebook,
    identical perturbation draw order): the compat path's contract is
    bit-reproduction of the reference's codebooks given the same seed,
    which the on-device f32 trainer cannot honour (the 1e-4 split
    perturbations sit below f32 matmul-expansion cancellation noise, so
    assignments between split twins - and hence the whole grow
    trajectory - diverge).  Runs on host; use the fused trainer for
    production."""
    ndims = data.shape[1]
    codebook = np.zeros((nb_entries, ndims))
    codebook[0] = np.mean(data, 0)
    e = 1
    while e < nb_entries:
        codebook[e, :] = codebook[0, :]
        codebook[:e, :] += 0.001 * (rng.rand(e, ndims) / 2.0)
        e += 1
        for _ in range(inner_updates):
            codebook[:e, :] = _update_np(data, codebook[:e, :], e)
    for _ in range(final_updates):
        codebook = _update_np(data, codebook, nb_entries, verbose)
    return codebook


def quantize(codebook: jax.Array, data: jax.Array) -> jax.Array:
    """Nearest-entry reconstruction (reference cb_func.quantize)."""
    idx = find_nearest(jnp.asarray(data, jnp.float32),
                       jnp.asarray(codebook, jnp.float32))
    return jnp.asarray(codebook)[idx]


def train_multistage(data, n_entries, rng=None, verbose=False, seed=0):
    """Train a chain of residual codebooks (reference train_cb.py:193-201
    semantics: r <- quantize(cb, r) - r after each stage).

    rng=None uses the fused on-device trainer; passing a numpy
    RandomState selects the reference-compatible host path (the whole
    chain - including the r <- qr - r residuals - then runs in the
    reference's float64 numpy arithmetic so the books it produces are
    bit-reproductions at f32 output precision).
    """
    books = []
    if rng is not None:
        r = np.asarray(data)
        for e in n_entries:
            cb = _vq_train_np(r, int(e), rng, 4, 10, verbose)
            books.append(jnp.asarray(cb, jnp.float32))
            qr = cb[_find_nearest_np(r, cb)]
            r = qr - r
        return books
    r = jnp.asarray(data, jnp.float32)
    for s, e in enumerate(n_entries):
        cb = vq_train(r, e, verbose=verbose, seed=seed + s)
        books.append(cb)
        qr = quantize(cb, r)
        r = qr - r
    return books
