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


def _deq(w):
    """Round-trip through the kernel's int8 weight quantisation."""
    from fpsc_tpu.ops.lpcnet_sampler import (dequantize_rows_int8,
                                             quantize_rows_int8)
    return dequantize_rows_int8(*quantize_rows_int8(jnp.asarray(w)))


def _dequantized_params(params, n_emb, e_dim):
    """LPCNetParams with every kernel-quantised weight replaced by its
    int8 round-trip - the float oracle of the weights_int8 path.  The
    conditioning columns of wi (consumed host-side) stay f32, exactly
    as pallas_generate splits them."""
    ha = params.gru_a.units
    wi_a = params.gru_a.wi
    wi_b = params.gru_b.wi
    return params._replace(
        sample_emb=params.sample_emb._replace(
            table=_deq(params.sample_emb.table.T).T),
        gru_a=params.gru_a._replace(
            wi=jnp.concatenate([_deq(wi_a[:, :n_emb * e_dim]),
                                wi_a[:, n_emb * e_dim:]], axis=1),
            wh=_deq(params.gru_a.wh)),
        gru_b=params.gru_b._replace(
            wi=jnp.concatenate([_deq(wi_b[:, :ha]), wi_b[:, ha:]],
                               axis=1),
            wh=_deq(params.gru_b.wh)),
        fc1=params.fc1._replace(w=_deq(params.fc1.w)),
        fc2=params.fc2._replace(w=_deq(params.fc2.w)))


def _statistical_trajectory_match(got, want, min_clean=None):
    """Shared AR-trajectory contract (see test_pallas_matches_xla_
    sampler): most items track end-to-end; flipped items track up to
    the first sampling flip."""
    b = got.shape[0]
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
                err_msg=f"item {i}: prefix before flip at t={t0}")
    assert clean >= (b - 2 if min_clean is None else min_clean), (
        f"only {clean}/{b} items flip-free - systematic divergence")


def test_quantize_rows_int8_roundtrip_error_bound():
    from fpsc_tpu.ops.lpcnet_sampler import (dequantize_rows_int8,
                                             quantize_rows_int8)
    w = jnp.asarray(RNG.randn(96, 48).astype(np.float32))
    q, s = quantize_rows_int8(w)
    assert q.dtype == jnp.int8 and s.shape == (96, 1)
    err = np.abs(np.asarray(dequantize_rows_int8(q, s)) - np.asarray(w))
    # symmetric rounding: error <= scale/2 per row
    assert (err <= np.asarray(s) * 0.5 + 1e-7).all()
    # zero rows survive exactly (sparse blocks quantise to zero)
    z = jnp.zeros((4, 48), jnp.float32)
    qz, sz = quantize_rows_int8(z)
    assert (np.asarray(qz) == 0).all()


def test_int8_kernel_matches_dequantized_xla_oracle():
    """weights_int8=True must reproduce the XLA sampler run with the
    int8-round-tripped weights: the quantisation IS the model change,
    the kernel path adds only matmul-rounding-level noise."""
    cfg = lpcnet.LPCNetConfig(gru_a_units=48, gru_b_units=16,
                              embed_dim=16, cond_units=24)
    params = lpcnet.init_lpcnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(7)
    b, frames = 8, 2
    feat = (rng.randn(b, frames, 20) * 0.3).astype(np.float32)
    periods = rng.randint(32, 256, (b, frames)).astype(np.int32)
    lpc = (rng.randn(b, frames, 16) * 0.05).astype(np.float32)
    key = jax.random.PRNGKey(3)

    want = np.asarray(lpcnet.generate(
        _dequantized_params(params, 3, cfg.embed_dim),
        jnp.asarray(feat), jnp.asarray(periods), jnp.asarray(lpc), key))
    got = np.asarray(pallas_generate(
        params, jnp.asarray(feat), jnp.asarray(periods),
        jnp.asarray(lpc), key, dtype=jnp.float32, weights_int8=True,
        interpret=True))
    _statistical_trajectory_match(got, want)


def test_int8_sparse_pattern_matches_int8_dense():
    """int8 composes with the block-sparse path: pruned blocks
    quantise to exact zeros, so both paths sum identical products."""
    cfg = lpcnet.LPCNetConfig(gru_a_units=64, gru_b_units=8,
                              embed_dim=16, cond_units=16)
    params = lpcnet.init_lpcnet(jax.random.PRNGKey(4), cfg)
    params = lpcnet.sparsify_gru_a(params, 0.5, block=(64, 32))
    from fpsc_tpu.ops.lpcnet_sampler import derive_block_pattern
    pattern, block = derive_block_pattern(params.gru_a.wh, (64, 32))

    b, frames = 8, 1
    feat = (RNG.randn(b, frames, 20) * 0.3).astype(np.float32)
    periods = RNG.randint(32, 256, (b, frames)).astype(np.int32)
    lpc = (RNG.randn(b, frames, 16) * 0.05).astype(np.float32)
    key = jax.random.PRNGKey(6)
    dense = np.asarray(pallas_generate(
        params, jnp.asarray(feat), jnp.asarray(periods),
        jnp.asarray(lpc), key, dtype=jnp.float32, weights_int8=True,
        interpret=True))
    sparse = np.asarray(pallas_generate(
        params, jnp.asarray(feat), jnp.asarray(periods),
        jnp.asarray(lpc), key, dtype=jnp.float32, weights_int8=True,
        gru_a_pattern=(pattern, block), interpret=True))
    np.testing.assert_allclose(sparse, dense, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("bunch", [2, 4])
def test_int8_bunched_matches_dequantized_kernel(bunch):
    """Bunched int8 (incl. the per-position head row slices of the
    stacked scale vector) vs the same kernel fed dequantised floats."""
    from fpsc_tpu.models import lpcnet_bunched
    cfg = lpcnet.LPCNetConfig(gru_a_units=48, gru_b_units=16,
                              embed_dim=16, cond_units=24)
    init = (lpcnet_bunched.init_bunched if bunch == 2
            else lpcnet_bunched.init_bunched4)
    params = init(jax.random.PRNGKey(1), cfg)
    n_emb = 2 * bunch + 1
    deq = params._replace(
        base=_dequantized_params(params.base, n_emb, cfg.embed_dim),
        fc3=params.fc3._replace(w=_deq(params.fc3.w)),
        fc4=params.fc4._replace(w=_deq(params.fc4.w)))

    rng = np.random.RandomState(11)
    b, frames = 8, 1
    feat = (rng.randn(b, frames, 20) * 0.3).astype(np.float32)
    periods = rng.randint(32, 256, (b, frames)).astype(np.int32)
    lpc = (rng.randn(b, frames, 16) * 0.05).astype(np.float32)
    key = jax.random.PRNGKey(9)
    want = np.asarray(pallas_generate(
        deq, jnp.asarray(feat), jnp.asarray(periods), jnp.asarray(lpc),
        key, dtype=jnp.float32, interpret=True))
    got = np.asarray(pallas_generate(
        params, jnp.asarray(feat), jnp.asarray(periods),
        jnp.asarray(lpc), key, dtype=jnp.float32, weights_int8=True,
        interpret=True))
    _statistical_trajectory_match(got, want)
