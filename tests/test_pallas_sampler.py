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


def test_sparse_pattern_kernel_matches_dense():
    """With block-sparsified weights, the static-pattern kernel path
    must produce the same samples as the dense path."""
    cfg = lpcnet.LPCNetConfig(gru_a_units=64, gru_b_units=8,
                              embed_dim=16, cond_units=16)
    params = lpcnet.init_lpcnet(jax.random.PRNGKey(4), cfg)
    params = lpcnet.sparsify_gru_a(params, 0.5, block=(64, 32))
    from fpsc_tpu.ops.lpcnet_sampler import derive_block_pattern
    pattern, block = derive_block_pattern(params.gru_a.wh, (64, 32))
    n_live = sum(len(c) for c in pattern)
    n_total = len(pattern) * (64 // 32) * 1  # (192/64=3 rows, 2 cols)
    assert n_live < 3 * 2  # actually sparse

    b, frames = 8, 1
    feat = (RNG.randn(b, frames, 20) * 0.3).astype(np.float32)
    periods = RNG.randint(32, 256, (b, frames)).astype(np.int32)
    lpc = (RNG.randn(b, frames, 16) * 0.05).astype(np.float32)
    key = jax.random.PRNGKey(6)
    dense = np.asarray(pallas_generate(
        params, jnp.asarray(feat), jnp.asarray(periods), jnp.asarray(lpc),
        key, dtype=jnp.float32, interpret=True))
    sparse = np.asarray(pallas_generate(
        params, jnp.asarray(feat), jnp.asarray(periods),
        jnp.asarray(lpc), key, dtype=jnp.float32,
        gru_a_pattern=(pattern, block), interpret=True))
    np.testing.assert_allclose(sparse, dense, rtol=1e-5, atol=1e-6)
