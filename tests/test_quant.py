"""Quantisation-layer tests: scalar, m-best VQ, and LBG vs oracles."""
import numpy as np

import jax.numpy as jnp

from fpsc_tpu.quant import lbg, scalar, vq

import oracles

RNG = np.random.RandomState(7)


def test_scalar_quantize_matches_argmin():
    data = RNG.randn(200).astype(np.float32)
    codes = np.sort(RNG.randn(16)).astype(np.float32)
    q, idx, counts = scalar.scl_quantize(jnp.asarray(data), jnp.asarray(codes))
    want_idx = np.argmin((data[:, None] - codes[None, :]) ** 2, axis=1)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(q), codes[want_idx])
    assert int(np.asarray(counts).sum()) == 200


def test_mbest_single_stage_is_plain_nearest():
    cb = RNG.randn(32, 17).astype(np.float32)
    x = RNG.randn(10, 17).astype(np.float32)
    qr, idx, counts = vq.vq_quantize(jnp.asarray(x), [jnp.asarray(cb)])
    want = oracles.nearest_1(x, cb)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], want)
    np.testing.assert_allclose(np.asarray(qr), cb[want], rtol=1e-6)


def test_mbest_multistage_matches_oracle_beam():
    cbs = [RNG.randn(24, 17).astype(np.float32),
           (RNG.randn(16, 17) * 0.3).astype(np.float32),
           (RNG.randn(12, 17) * 0.1).astype(np.float32)]
    x = RNG.randn(25, 17).astype(np.float32)
    qr, idx, counts = vq.vq_quantize(
        jnp.asarray(x), [jnp.asarray(c) for c in cbs])
    for i in range(x.shape[0]):
        recon, path = oracles.mbest_1(
            x[i].astype(np.float64), [c.astype(np.float64) for c in cbs])
        assert list(np.asarray(idx)[i]) == path, f"row {i}"
        np.testing.assert_allclose(np.asarray(qr)[i], recon,
                                   rtol=1e-4, atol=1e-5)
    total = sum(int(np.asarray(c).sum()) for c in counts)
    assert total == 3 * x.shape[0]


def test_mbest_beats_greedy():
    """The 5-survivor beam must never lose to greedy stage-wise argmin."""
    cbs = [RNG.randn(16, 8).astype(np.float32),
           (RNG.randn(16, 8) * 0.5).astype(np.float32)]
    x = RNG.randn(50, 8).astype(np.float32)
    qr, _, _ = vq.vq_quantize(jnp.asarray(x), [jnp.asarray(c) for c in cbs])
    beam_err = np.sum((np.asarray(qr) - x) ** 2, -1)
    g0 = cbs[0][oracles.nearest_1(x, cbs[0])]
    g1 = cbs[1][oracles.nearest_1(x - g0, cbs[1])]
    greedy_err = np.sum((g0 + g1 - x) ** 2, -1)
    assert np.all(beam_err <= greedy_err + 1e-5)


def test_dequantize_inverts_indices():
    cbs = [RNG.randn(8, 4).astype(np.float32),
           RNG.randn(8, 4).astype(np.float32)]
    x = RNG.randn(6, 4).astype(np.float32)
    qr, idx, _ = vq.vq_quantize(jnp.asarray(x), [jnp.asarray(c) for c in cbs])
    rec = vq.vq_dequantize(idx, [jnp.asarray(c) for c in cbs])
    np.testing.assert_allclose(np.asarray(rec), np.asarray(qr), rtol=1e-6)


def test_kmeans_update_matches_oracle():
    data = RNG.randn(500, 6).astype(np.float32)
    cb = RNG.randn(10, 6).astype(np.float32)
    got, counts = lbg.kmeans_update(jnp.asarray(data), jnp.asarray(cb),
                                    jnp.asarray(10))
    want, wcnt = oracles.kmeans_update_1(data.astype(np.float64),
                                         cb.astype(np.float64))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(counts), wcnt)


def test_kmeans_update_empty_cluster_zeroes():
    data = np.ones((20, 3), np.float32)
    cb = np.stack([np.ones(3, np.float32), 100 * np.ones(3, np.float32)])
    got, counts = lbg.kmeans_update(jnp.asarray(data), jnp.asarray(cb),
                                    jnp.asarray(2))
    assert float(counts[1]) == 0.0
    np.testing.assert_allclose(np.asarray(got)[1], 0.0)  # 0/(0+1e-20)


def test_lbg_train_matches_oracle_small():
    data = RNG.randn(300, 5).astype(np.float32) @ np.diag(
        [3, 2, 1, 1, 0.5]).astype(np.float32)
    got = np.asarray(lbg.vq_train(data, 8, rng=np.random.RandomState(42)))
    want = oracles.lbg_train_1(data.astype(np.float64), 8,
                               np.random.RandomState(42))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_lbg_reduces_distortion():
    data = RNG.randn(2000, 17).astype(np.float32)
    cb = lbg.vq_train(data, 16, rng=np.random.RandomState(0))
    q = np.asarray(lbg.quantize(cb, data))
    err = np.mean(np.sum((q - data) ** 2, -1))
    base = np.mean(np.sum((data - data.mean(0)) ** 2, -1))
    assert err < 0.9 * base


def test_multistage_residual_chain():
    data = RNG.randn(1000, 17).astype(np.float32)
    books = lbg.train_multistage(data, [8, 8], rng=np.random.RandomState(3))
    assert len(books) == 2 and books[0].shape == (8, 17)
    qr, idx, _ = vq.vq_quantize(jnp.asarray(data), books)
    err = np.mean(np.sum((np.asarray(qr) - data) ** 2, -1))
    q1 = np.asarray(lbg.quantize(books[0], data))
    err1 = np.mean(np.sum((q1 - data) ** 2, -1))
    assert err < err1  # second stage helps


def test_lbg_fused_fast_mode():
    """The single-program trainer must reach compat-mode distortion."""
    data = RNG.randn(3000, 17).astype(np.float32)
    cb_fast = lbg.vq_train(data, 16, seed=0)
    cb_slow = lbg.vq_train(data, 16, rng=np.random.RandomState(0))
    def distortion(cb):
        q = np.asarray(lbg.quantize(cb, data))
        return np.mean(np.sum((q - data) ** 2, -1))
    assert distortion(cb_fast) < 1.1 * distortion(cb_slow)
