"""Location-aware attention (ClovaCall style).

Capability parity with reference src/models/wavernn.py:383-441 (unused
there, but part of the component inventory): conv1d over the previous
alignment + projected query/value scoring with optional sigmoid
smoothing.  Batched, jittable; the reference's autoregressive
`loop_attention` driver (wavernn.py:104-134) is `loop_attention` here,
expressed as a lax.scan over query positions with a fixed attention
window.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fpsc_tpu.models.common import DenseParams, dense, init_dense


class LocationAttentionParams(NamedTuple):
    conv_w: jax.Array      # (hidden, 1, 3)
    conv_b: jax.Array      # (hidden,)
    query_proj: DenseParams
    value_proj: DenseParams
    score_proj: DenseParams
    bias: jax.Array        # (hidden,)


def init_location_attention(key, hidden: int) -> LocationAttentionParams:
    ks = jax.random.split(key, 5)
    qp = init_dense(ks[0], hidden, hidden)
    vp = init_dense(ks[1], hidden, hidden)
    sp = init_dense(ks[2], hidden, 1)
    return LocationAttentionParams(
        conv_w=jax.random.normal(ks[3], (hidden, 1, 3)) * 0.1,
        conv_b=jnp.zeros((hidden,)),
        query_proj=qp._replace(b=jnp.zeros_like(qp.b)),
        value_proj=vp._replace(b=jnp.zeros_like(vp.b)),
        score_proj=sp,
        bias=jax.random.uniform(ks[4], (hidden,), minval=-0.1,
                                maxval=0.1),
    )


def attend(p: LocationAttentionParams, query: jax.Array,
           value: jax.Array, last_attn: Optional[jax.Array] = None,
           mask: Optional[jax.Array] = None,
           smoothing: bool = True) -> Tuple[jax.Array, jax.Array]:
    """query: (B, 1, H); value: (B, T, H); last_attn: (B, T).

    Returns (context (B, 1, H), attn (B, T)).
    """
    b, t, h = value.shape
    if last_attn is None:
        last_attn = jnp.zeros((b, t))
    conv_attn = jax.lax.conv_general_dilated(
        last_attn[:, None, :], p.conv_w, window_strides=(1,),
        padding=[(1, 1)], dimension_numbers=("NCH", "OIH", "NCH"))
    conv_attn = jnp.transpose(conv_attn, (0, 2, 1)) + p.conv_b
    score = dense(p.score_proj, jnp.tanh(
        dense(p.query_proj, query)
        + dense(p.value_proj, value)
        + conv_attn + p.bias))[..., 0]               # (B, T)
    if mask is not None:
        score = jnp.where(mask, score, -1e9)
    if smoothing:
        score = jax.nn.sigmoid(score)
        if mask is not None:
            score = jnp.where(mask, score, 0.0)
        attn = score / jnp.sum(score, -1, keepdims=True)
    else:
        attn = jax.nn.softmax(score, -1)
    context = jnp.einsum("bt,bth->bh", attn, value)[:, None, :]
    return context, attn


def loop_attention(p: LocationAttentionParams, x: jax.Array,
                   attn_range: int = 10,
                   smoothing: bool = True) -> jax.Array:
    """Autoregressive attention over a sliding window (reference
    wavernn.py:104-134) as a scan; x: (B, L, H) -> (B, L, H)."""
    b, length, h = x.shape
    pos = jnp.arange(length)

    def step(last_attn, i):
        window_mask = (pos <= i) & (pos > i - attn_range)
        query = jax.lax.dynamic_slice_in_dim(x, i, 1, axis=1)
        ctx, attn = attend(p, query, x, last_attn,
                           mask=window_mask[None, :], smoothing=smoothing)
        return attn, ctx[:, 0]

    _, out = jax.lax.scan(step, jnp.zeros((b, length)),
                          jnp.arange(length))
    return jnp.swapaxes(out, 0, 1)
