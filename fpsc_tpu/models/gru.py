"""GRU primitives as explicit param pytrees + lax.scan programs.

Gate math follows the standard (torch-convention) GRU so that the
frame predictor reproduces the reference recurrence (reference:
src/models/wavernn.py:37-38 uses nn.GRU):

    r = sigmoid(x Wir^T + bir + h Whr^T + bhr)
    z = sigmoid(x Wiz^T + biz + h Whz^T + bhz)
    n = tanh  (x Win^T + bin + r * (h Whn^T + bhn))
    h' = (1 - z) n + z h

TPU-first details:
* full-sequence runs precompute the input projection x@Wi for ALL
  timesteps as one large MXU matmul; only the h@Wh recurrence stays
  inside the scan,
* single-step `gru_step` is exposed for fused autoregressive scans
  (closed-loop encoder, vocoder sampling) where the state feedback is
  data-dependent.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class GRUParams(NamedTuple):
    wi: jax.Array  # (3H, I)  [r|z|n] blocks, torch layout
    wh: jax.Array  # (3H, H)
    bi: jax.Array  # (3H,)
    bh: jax.Array  # (3H,)

    @property
    def units(self) -> int:
        return self.wh.shape[-1]


def init_gru(key: jax.Array, in_features: int, units: int,
             dtype=jnp.float32) -> GRUParams:
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init (torch nn.GRU default)."""
    k = 1.0 / jnp.sqrt(jnp.asarray(units, jnp.float32))
    keys = jax.random.split(key, 4)
    u = lambda kk, shape: jax.random.uniform(kk, shape, dtype, -k, k)
    return GRUParams(
        wi=u(keys[0], (3 * units, in_features)),
        wh=u(keys[1], (3 * units, units)),
        bi=u(keys[2], (3 * units,)),
        bh=u(keys[3], (3 * units,)),
    )


def _gates(pre_x: jax.Array, h: jax.Array, wh: jax.Array,
           bh: jax.Array) -> jax.Array:
    """Combine precomputed input projection with the recurrent term."""
    units = h.shape[-1]
    gh = jnp.dot(h, wh.T, preferred_element_type=jnp.float32) + bh
    xr, xz, xn = jnp.split(pre_x, 3, axis=-1)
    hr, hz, hn = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def gru_step(params: GRUParams, h: jax.Array, x: jax.Array) -> jax.Array:
    """One step. x: (B, I), h: (B, H) -> new h (B, H)."""
    pre_x = jnp.dot(x, params.wi.T,
                    preferred_element_type=jnp.float32) + params.bi
    return _gates(pre_x, h, params.wh, params.bh)


def gru_scan(params: GRUParams, xs: jax.Array,
             h0: Optional[jax.Array] = None, reverse: bool = False):
    """Full sequence. xs: (B, L, I) -> (ys (B, L, H), hT (B, H)).

    The input projection runs as one (B*L, I)@(I, 3H) matmul before the
    scan so the recurrence only carries the (B, H)@(H, 3H) term.
    """
    b, l, _ = xs.shape
    h0 = jnp.zeros((b, params.units), xs.dtype) if h0 is None else h0
    pre = jnp.dot(xs, params.wi.T,
                  preferred_element_type=jnp.float32) + params.bi

    def body(h, pre_t):
        h = _gates(pre_t, h, params.wh, params.bh)
        return h, h

    h_t, ys = jax.lax.scan(body, h0, jnp.swapaxes(pre, 0, 1),
                           reverse=reverse)
    return jnp.swapaxes(ys, 0, 1), h_t


def bigru_scan(fwd: GRUParams, bwd: GRUParams, xs: jax.Array):
    """Bidirectional GRU: concat(forward, backward) features."""
    yf, _ = gru_scan(fwd, xs)
    yb, _ = gru_scan(bwd, xs, reverse=True)
    return jnp.concatenate([yf, yb], axis=-1)
