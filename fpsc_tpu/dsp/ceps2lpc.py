"""Batched cepstrum -> LPC frontend as a single XLA program.

Reproduces the math of the reference pipeline (reference:
src/ceps2lpc/ceps2lpc_vct.py:122-161, itself a port of LPCNet's
lpc_from_cepstrum) but TPU-first:

* idct and band interpolation are dense matmuls (MXU) instead of
  per-band Python loops,
* the autocorrelation is a batched irfft,
* Levinson-Durbin runs as a statically unrolled 16-step recursion,
  vectorised over the batch, with the reference's data-dependent
  early-exit expressed as a per-row `done` mask (reference:
  src/ceps2lpc/ceps2lpc_vct.py:81-85 breaks once the prediction error
  falls below ac0/2^10 or 0.001*ac0; we keep updating nothing once the
  mask trips, which is exactly equivalent).

Everything is vmappable/jittable; use `ceps2lpc(cepstra)` on (N, >=18)
arrays of un-normalised Bark cepstra.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from fpsc_tpu.dsp import constants as C


def idct(x: jax.Array) -> jax.Array:
    """Inverse DCT over the last axis. x: (..., 18) -> (..., 18)."""
    table = jnp.asarray(C.DCT_TABLE)
    return jnp.matmul(x, table.T,
                      precision=jax.lax.Precision.HIGHEST) * C.IDCT_SCALE


def dct(x: jax.Array) -> jax.Array:
    """Forward DCT over the last axis (inverse of `idct`)."""
    table = jnp.asarray(C.DCT_FWD_TABLE)
    return jnp.matmul(x, table,
                      precision=jax.lax.Precision.HIGHEST) * C.IDCT_SCALE


def interp_band_gain(band_e: jax.Array) -> jax.Array:
    """Linear interpolation of 18 band gains to 161 spectrum bins."""
    return jnp.matmul(band_e, jnp.asarray(C.INTERP_MATRIX),
                      precision=jax.lax.Precision.HIGHEST)


def levinson(ac: jax.Array, order: int = C.LPC_ORDER):
    """Batched Levinson-Durbin with the reference's early-exit semantics.

    ac: (N, order+1) autocorrelations.
    Returns (error, lpc, rc): (N,), (N, order), (N, order).

    The recursion is unrolled statically (order == 16) so XLA sees pure
    vector ops; each row carries a `done` flag that freezes its state
    once the 30 dB-gain early exit (or ac0/2^10) would have fired.
    """
    n = ac.shape[0]
    ac0 = ac[:, 0]
    error = ac0
    lpc = jnp.zeros((n, order), ac.dtype)
    rc = jnp.zeros((n, order), ac.dtype)
    # Rows with ac[0] == 0 never enter the loop at all.
    done = ac0 == 0.0

    for i in range(order):
        if i == 0:
            rr = ac[:, 1]
        else:
            # sum_{j<i} lpc[:, j] * ac[:, i-j]
            rr = jnp.einsum(
                "nj,nj->n", lpc[:, :i], ac[:, 1:i + 1][:, ::-1],
                precision=jax.lax.Precision.HIGHEST,
            ) + ac[:, i + 1]
        safe_error = jnp.where(error == 0.0, 1.0, error)
        r = -rr / safe_error

        rc = rc.at[:, i].set(jnp.where(done, rc[:, i], r))
        # new lpc[j] = lpc[j] + r * lpc[i-1-j] for j < i, then lpc[i] = r.
        if i > 0:
            head = lpc[:, :i] + r[:, None] * lpc[:, :i][:, ::-1]
            new_lpc = jnp.concatenate(
                [head, r[:, None], lpc[:, i + 1:]], axis=1)
        else:
            new_lpc = jnp.concatenate([r[:, None], lpc[:, 1:]], axis=1)
        lpc = jnp.where(done[:, None], lpc, new_lpc)

        new_error = error - r * r * error
        error = jnp.where(done, error, new_error)
        done = done | (error < ac0 / 1024.0) | (error < 0.001 * ac0)

    return error, lpc, rc


def cepstrum_to_autocorr(cepstra: jax.Array) -> jax.Array:
    """Cepstra (N, >=18) -> lag-windowed autocorrelation (N, 17)."""
    tmp = cepstra[:, :C.NB_BANDS]
    tmp = tmp.at[:, 0].add(4.0)
    ex = idct(tmp)
    ex = jnp.power(10.0, ex) * jnp.asarray(C.COMPENSATION)
    xr = interp_band_gain(ex)              # (N, 161) power spectrum
    acr = jnp.fft.irfft(xr, n=C.WINDOW_SIZE, axis=-1)  # (N, 320)
    acr = acr[:, :C.LPC_ORDER + 1]
    acr = acr.at[:, 0].add(acr[:, 0] * 1e-4 + C.AC_NOISE_FLOOR)
    acr = acr * jnp.asarray(C.LAG_WINDOW)
    return acr


@jax.jit
def ceps2lpc(cepstra: jax.Array):
    """Full batched cepstrum -> LPC pipeline.

    cepstra: (N, >=18) un-normalised Bark cepstra (c0 offset applied
    internally).  Returns (error, lpc, rc) with lpc shaped (N, 16).
    Mirrors reference src/ceps2lpc/ceps2lpc_vct.py:122-161 but runs as
    one fused XLA program (no per-row Python Levinson loop).
    """
    acr = cepstrum_to_autocorr(cepstra.astype(jnp.float32))
    return levinson(acr, C.LPC_ORDER)
