"""Fused Pallas sampler vs the XLA scan sampler (interpret mode, f32)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpsc_tpu.models import lpcnet
from fpsc_tpu.ops.lpcnet_sampler import pallas_generate

RNG = np.random.RandomState(41)


def test_pallas_matches_xla_sampler():
    cfg = lpcnet.LPCNetConfig(gru_a_units=48, gru_b_units=16,
                              embed_dim=16, cond_units=24)
    params = lpcnet.init_lpcnet(jax.random.PRNGKey(0), cfg)
    b, frames = 8, 2
    feat = (RNG.randn(b, frames, 20) * 0.3).astype(np.float32)
    periods = RNG.randint(32, 256, (b, frames)).astype(np.int32)
    lpc = (RNG.randn(b, frames, 16) * 0.05).astype(np.float32)
    key = jax.random.PRNGKey(5)

    want = np.asarray(lpcnet.generate(
        params, jnp.asarray(feat), jnp.asarray(periods), jnp.asarray(lpc),
        key))
    got = np.asarray(pallas_generate(
        params, jnp.asarray(feat), jnp.asarray(periods), jnp.asarray(lpc),
        key, dtype=jnp.float32, interpret=True))
    assert got.shape == want.shape
    # identical sample-index decisions -> near-identical waveforms
    n_diff = np.sum(np.abs(got - want) > 1e-3)
    assert n_diff == 0, f"{n_diff} of {got.size} samples diverge"
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
