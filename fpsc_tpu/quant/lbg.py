"""LBG-style split + k-means codebook training, on-device.

Functional equivalent of the reference's NumPy trainer (reference:
src/quantization/cb_func.py:28-112): start from the data mean, add one
entry at a time (copy of entry 0), perturb all live entries by
.001*U[0,1)/2, run 4 k-means updates, then 10 final updates.  Empty
clusters collapse to the zero vector via the same count+1e-20 division.

TPU-first design:

* the (N, E) assignment runs as ||x||^2 - 2 x.c + ||c||^2 on the MXU
  (a fused Pallas kernel is available in fpsc_tpu.ops.vq_pallas for the
  hot path), with inactive (not yet split) entries masked to +inf so a
  single compiled update serves every codebook size - no per-size
  recompilation for the 1..E growth loop,
* centroid accumulation is a segment-sum (scatter-add), not a Python
  loop over vectors.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def pairwise_sq_dist(data: jax.Array, codebook: jax.Array) -> jax.Array:
    """(N, D), (E, D) -> (N, E) squared distances via the MXU expansion."""
    x2 = jnp.sum(data * data, axis=1, keepdims=True)          # (N, 1)
    c2 = jnp.sum(codebook * codebook, axis=1)[None, :]        # (1, E)
    xc = jnp.matmul(data, codebook.T,
                    preferred_element_type=jnp.float32)        # (N, E)
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


def vq_train(data: jax.Array, nb_entries: int,
             rng: Optional[np.random.RandomState] = None,
             inner_updates: int = 4, final_updates: int = 10,
             verbose: bool = False) -> jax.Array:
    """Train one stage's codebook with the reference's grow-by-one LBG.

    data: (N, D); returns (nb_entries, D).  `rng` supplies the
    .001*U/2 split perturbations (seeded numpy for reproducibility and
    parity with the reference's np.random.rand at cb_func.py:41).
    """
    rng = rng or np.random.RandomState(0)
    data = jnp.asarray(data, jnp.float32)
    ndims = data.shape[1]
    codebook = jnp.zeros((nb_entries, ndims), jnp.float32)
    codebook = codebook.at[0].set(jnp.mean(data, axis=0))

    for e in range(1, nb_entries):
        codebook = codebook.at[e].set(codebook[0])
        delta = jnp.asarray(
            0.001 * (rng.rand(e, ndims) / 2.0), jnp.float32)
        codebook = codebook.at[:e].add(delta)
        n_active = jnp.asarray(e + 1)
        for _ in range(inner_updates):
            codebook, _ = kmeans_update(data, codebook, n_active)

    for _ in range(final_updates):
        codebook, counts = kmeans_update(
            data, codebook, jnp.asarray(nb_entries))
        if verbose:
            c = np.asarray(counts)
            print(f"{nb_entries} - min: {c.min()}, max: {c.max()}, "
                  f"small: {int((c == 0).sum())}")
    return codebook


def quantize(codebook: jax.Array, data: jax.Array) -> jax.Array:
    """Nearest-entry reconstruction (reference cb_func.quantize)."""
    idx = find_nearest(jnp.asarray(data, jnp.float32),
                       jnp.asarray(codebook, jnp.float32))
    return jnp.asarray(codebook)[idx]


def train_multistage(data, n_entries, rng=None, verbose=False):
    """Train a chain of residual codebooks (reference train_cb.py:193-201
    semantics: r <- quantize(cb, r) - r after each stage)."""
    rng = rng or np.random.RandomState(0)
    r = jnp.asarray(data, jnp.float32)
    books = []
    for e in n_entries:
        cb = vq_train(r, e, rng=rng, verbose=verbose)
        books.append(cb)
        qr = quantize(cb, r)
        r = qr - r
    return books
