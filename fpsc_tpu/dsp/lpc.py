"""Batched LPC prediction.

TPU-native equivalent of the reference's `lpc_pred` (reference:
src/utils.py:91-114), which predicts each sample from the previous 16
samples weighted by per-frame LPC coefficients:

    pred[t] = - sum_{i=0..15} lpc[t, i] * x[t - i]

(the i == 0 term intentionally includes x[t] itself; downstream code
uses `roll(pred, 1)` so that the excitation at t is
x[t] + sum_i lpc[i] x[t-1-i], exactly as the reference does at
src/train.py:125-126).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from fpsc_tpu.dsp import constants as C


def lpc_pred(x: jax.Array, lpc: jax.Array, n_repeat: int = C.FRAME_SIZE) -> jax.Array:
    """x: (B, T) samples; lpc: (B, nframes, 16) with nframes*n_repeat == T
    (or n_repeat == 1 and lpc already at sample rate).

    Returns pred: (B, T).
    """
    order = lpc.shape[-1]
    t = x.shape[-1]
    if n_repeat != 1:
        lpc = jnp.repeat(lpc, n_repeat, axis=1)  # (B, T, 16)
    pad_x = jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (order,), x.dtype), x], axis=-1)
    # stack_x[..., t, i] = x[t - i]
    stack_x = jnp.stack(
        [pad_x[..., order - i:order - i + t] for i in range(order)], axis=-1)
    return -jnp.sum(lpc * stack_x, axis=-1)


def excitation(x: jax.Array, lpc: jax.Array, n_repeat: int = C.FRAME_SIZE) -> jax.Array:
    """exc[t] = x[t] - pred[t-1], the teacher-forcing target used by the
    vocoder trainers (reference: src/train.py:126)."""
    pred = lpc_pred(x, lpc, n_repeat)
    return x - jnp.roll(pred, shift=1, axis=-1), pred


def lpc_synthesis(exc: jax.Array, lpc: jax.Array,
                  n_repeat: int = C.FRAME_SIZE) -> jax.Array:
    """Inverse of `excitation`: reconstruct x from the excitation and
    per-frame LPC via the IIR x[t] = exc[t] - sum_i a[t-1, i] x[t-1-i]
    (the decoder-side synthesis filter; parallel vocoders like the IAF
    student emit excitation and need this to produce audio).

    exc: (B, T); lpc: (B, nframes, 16). One lax.scan over time with a
    16-sample carried history.
    """
    order = lpc.shape[-1]
    if n_repeat != 1:
        lpc = jnp.repeat(lpc, n_repeat, axis=1)        # (B, T, 16)
    # coefficients applied at t come from sample t-1 (roll like
    # excitation's roll(pred, 1))
    coef = jnp.roll(lpc, shift=1, axis=1)
    b = exc.shape[0]

    def step(hist, inp):
        e_t, a_t = inp                                  # (B,), (B, 16)
        # hist holds [x[t-16] .. x[t-1]] newest-last; a_t[i] pairs
        # x[t-1-i] -> reverse the coefficient order against hist
        x_t = e_t - jnp.sum(hist * a_t[:, ::-1], axis=-1)
        hist = jnp.concatenate([hist[:, 1:], x_t[:, None]], axis=1)
        return hist, x_t

    xs = (jnp.swapaxes(exc, 0, 1), jnp.swapaxes(coef, 0, 1))
    _, ys = jax.lax.scan(step, jnp.zeros((b, order), exc.dtype), xs)
    return jnp.swapaxes(ys, 0, 1)
