"""Fused Pallas sampler vs the XLA scan sampler (interpret mode, f32)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpsc_tpu.models import lpcnet
from fpsc_tpu.ops.lpcnet_sampler import pallas_generate

RNG = np.random.RandomState(41)


@pytest.mark.parametrize("seed,corr_val", [(0, None), (1, 0.4), (2, 0.5)])
def test_pallas_matches_xla_sampler(seed, corr_val):
    """Trajectory parity of the fused kernel vs the XLA scan sampler.

    The two programs share the same sampling arithmetic (unnormalised
    exp, Z-scaled tail cut, Hillis-Steele prefix sum, total = last
    prefix element) but are necessarily NOT bit-identical: their matmul
    layouts and the kernel's mu-law diff-sum reconstruction each round
    differently, leaving ~1e-7-level state noise every step.  That
    noise can flip a sampling decision on a knife-edge threshold
    (~1-2% of 320-step item trajectories), and a flip cascades through
    the AR feedback.  The contract therefore is statistical: a real
    kernel bug diverges every item immediately, so we require (a) most
    items to track exactly within 1e-3 end-to-end, and (b) any flipped
    item to match tightly up to its first flip."""
    cfg = lpcnet.LPCNetConfig(gru_a_units=48, gru_b_units=16,
                              embed_dim=16, cond_units=24)
    params = lpcnet.init_lpcnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(41)
    b, frames = 8, 2
    feat = (rng.randn(b, frames, 20) * 0.3).astype(np.float32)
    periods = rng.randint(32, 256, (b, frames)).astype(np.int32)
    lpc = (rng.randn(b, frames, 16) * 0.05).astype(np.float32)
    key = jax.random.PRNGKey(seed)
    corr = None if corr_val is None else jnp.full((b, frames), corr_val)

    want = np.asarray(lpcnet.generate(
        params, jnp.asarray(feat), jnp.asarray(periods), jnp.asarray(lpc),
        key, corr=corr))
    got = np.asarray(pallas_generate(
        params, jnp.asarray(feat), jnp.asarray(periods), jnp.asarray(lpc),
        key, corr=corr, dtype=jnp.float32, interpret=True))
    assert got.shape == want.shape
    clean = 0
    for i in range(b):
        diverged = np.argwhere(np.abs(got[i] - want[i]) > 1e-3).ravel()
        if len(diverged) == 0:
            clean += 1
            np.testing.assert_allclose(got[i], want[i],
                                       rtol=1e-4, atol=1e-5)
        else:
            t0 = int(diverged[0])
            assert t0 > 0, "diverged from the very first sample"
            np.testing.assert_allclose(
                got[i, :t0], want[i, :t0], rtol=1e-4, atol=1e-5,
                err_msg=f"item {i}: prefix before flip at t={t0} "
                        "does not track")
    assert clean >= b - 2, (
        f"only {clean}/{b} items flip-free - systematic divergence")


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


def test_auto_block_pattern():
    """Trained-sparse models deploy the kernel's block-sparse path
    automatically; dense models get None."""
    from fpsc_tpu.ops.lpcnet_sampler import auto_block_pattern
    cfg = lpcnet.LPCNetConfig(gru_a_units=64, gru_b_units=8,
                              embed_dim=16, cond_units=16)
    params = lpcnet.init_lpcnet(jax.random.PRNGKey(0), cfg)
    assert auto_block_pattern(params, block=(64, 32)) is None
    sp = lpcnet.sparsify_gru_a(params, 0.3, block=(64, 32))
    pat = auto_block_pattern(sp, block=(64, 32))
    assert pat is not None
    live = sum(len(c) for c in pat[0])
    assert 0 < live < len(pat[0]) * 2
    # production geometry with the default (64, 64) blocks
    pp = lpcnet.init_lpcnet(jax.random.PRNGKey(1))
    spp = lpcnet.sparsify_gru_a(pp, 0.2, block=(64, 64))
    patp = auto_block_pattern(spp)
    assert sum(len(c) for c in patp[0]) <= 24   # ~0.2 * 108 + diag
    assert auto_block_pattern(pp) is None
