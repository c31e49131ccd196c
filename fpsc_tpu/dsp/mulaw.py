"""Mu-law companding on 16-bit-scaled linear samples.

Matches reference src/utils.py:19-31 (l2u / u2l): 256-level mu-law over
samples in [-1, 1) scaled by 32768/255.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SCALE = 255.0 / 32768.0
_SCALE_1 = 32768.0 / 255.0
_LOG256 = float(np.log(256.0))


def l2u(x: jax.Array) -> jax.Array:
    """Linear (16-bit range) -> mu-law code in [0, 255]."""
    s = jnp.sign(x)
    xa = jnp.abs(x)
    u = s * (128.0 * jnp.log1p(_SCALE * xa) / _LOG256)
    return jnp.clip(128.0 + u, 0.0, 255.0)


def u2l(u: jax.Array) -> jax.Array:
    """Mu-law code -> linear (16-bit range)."""
    u = u.astype(jnp.float32) - 128.0
    s = jnp.sign(u)
    ua = jnp.abs(u)
    return s * _SCALE_1 * (jnp.exp(ua / 128.0 * _LOG256) - 1.0)


def l2u_index(x: jax.Array) -> jax.Array:
    """Quantised mu-law index (int32 in [0, 255]) for embedding lookups."""
    return jnp.clip(jnp.round(l2u(x)), 0, 255).astype(jnp.int32)
