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
