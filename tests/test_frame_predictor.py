"""Frame predictor tests: GRU vs torch oracle, closed-loop codec parity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpsc_tpu.models import frame_predictor as fp
from fpsc_tpu.models.gru import gru_scan, gru_step, init_gru

import oracles

RNG = np.random.RandomState(11)


def _torch_gru_oracle(params, x):
    """Run torch's nn.GRU with our weights as ground truth."""
    import torch
    i = params.wi.shape[1]
    h = params.wh.shape[1]
    g = torch.nn.GRU(i, h, 1, batch_first=True)
    sd = {
        "weight_ih_l0": torch.tensor(np.asarray(params.wi)),
        "weight_hh_l0": torch.tensor(np.asarray(params.wh)),
        "bias_ih_l0": torch.tensor(np.asarray(params.bi)),
        "bias_hh_l0": torch.tensor(np.asarray(params.bh)),
    }
    g.load_state_dict(sd)
    with torch.no_grad():
        y, hT = g(torch.tensor(x))
    return y.numpy(), hT.numpy()[0]


def test_gru_matches_torch():
    params = init_gru(jax.random.PRNGKey(0), 12, 24)
    x = RNG.randn(3, 17, 12).astype(np.float32)
    ys, hT = gru_scan(params, jnp.asarray(x))
    want_y, want_h = _torch_gru_oracle(params, x)
    np.testing.assert_allclose(np.asarray(ys), want_y, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), want_h, rtol=1e-4, atol=1e-5)


def test_gru_step_consistent_with_scan():
    params = init_gru(jax.random.PRNGKey(1), 8, 16)
    x = RNG.randn(2, 5, 8).astype(np.float32)
    ys, hT = gru_scan(params, jnp.asarray(x))
    h = jnp.zeros((2, 16))
    for t in range(5):
        h = gru_step(params, h, jnp.asarray(x[:, t]))
        np.testing.assert_allclose(np.asarray(h), np.asarray(ys[:, t]),
                                   rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def model():
    cfg = fp.FramePredictorConfig(gru_units1=48, gru_units2=24)
    params = fp.init_frame_predictor(jax.random.PRNGKey(42), cfg)
    return params


@pytest.fixture(scope="module")
def codebooks():
    r = np.random.RandomState(5)
    return fp.Codebooks(
        scl=jnp.asarray(np.sort(r.randn(16)).astype(np.float32) * 0.1),
        vq=(jnp.asarray(r.randn(32, 17).astype(np.float32) * 0.1),
            jnp.asarray(r.randn(16, 17).astype(np.float32) * 0.03)),
        scl_bl=jnp.asarray(np.sort(r.randn(4)).astype(np.float32) * 0.02),
        vq_bl=(jnp.asarray(r.randn(8, 17).astype(np.float32) * 0.02),),
    )


def test_forward_shape_and_range(model):
    feat = RNG.randn(4, 30, 20).astype(np.float32) * 0.3
    out, h1, h2 = fp.forward(model, jnp.asarray(feat))
    assert out.shape == (4, 30, 18)
    assert float(jnp.max(jnp.abs(out))) <= 2.0  # 2*tanh head


def test_forward_streaming_equals_full(model):
    """Carrying (h1, h2) across segments must equal one full pass."""
    feat = RNG.randn(2, 20, 20).astype(np.float32) * 0.3
    full, _, _ = fp.forward(model, jnp.asarray(feat))
    a, h1, h2 = fp.forward(model, jnp.asarray(feat[:, :7]))
    b, _, _ = fp.forward(model, jnp.asarray(feat[:, 7:]), h1, h2)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([a, b], 1)), np.asarray(full),
        rtol=1e-5, atol=1e-6)


def _encode_loop_oracle(model, cbs, feat, l1, l2):
    """Per-frame Python re-implementation of the closed-loop encode,
    quantising with the numpy beam oracle."""
    b, length, _ = feat.shape
    scl = np.asarray(cbs.scl)
    scl_bl = np.asarray(cbs.scl_bl)
    vq_books = [np.asarray(c).astype(np.float64) for c in cbs.vq]
    vq_bl_books = [np.asarray(c).astype(np.float64) for c in cbs.vq_bl]

    h1 = jnp.zeros((b, model.rnn1.units))
    h2 = jnp.zeros((b, model.rnn2.units))
    prev = np.zeros((b, 18), np.float32)
    c_in = np.zeros((b, length, 18), np.float32)
    idx_scl = np.full((b, length), -1, np.int64)
    idx_vq = np.full((b, length, len(vq_books)), -1, np.int64)
    for t in range(length):
        x = jnp.asarray(
            np.concatenate([prev, feat[:, t, 18:]], -1).astype(np.float32))
        f_out, h1, h2 = fp.step(model, h1, h2, x)
        f_out = np.asarray(f_out)
        r_s = feat[:, t, :18] - f_out
        r_q = np.zeros_like(r_s)
        for k in range(b):
            if abs(r_s[k, 0]) > l1:
                i0 = int(np.argmin((r_s[k, 0] - scl) ** 2))
                r_q[k, 0] = scl[i0]
                idx_scl[k, t] = i0
            else:
                i0 = int(np.argmin((r_s[k, 0] - scl_bl) ** 2))
                r_q[k, 0] = scl_bl[i0]
            if np.sum(np.abs(r_s[k, 1:])) > l2:
                rec, path = oracles.mbest_1(r_s[k, 1:].astype(np.float64),
                                            vq_books)
                r_q[k, 1:] = rec
                idx_vq[k, t] = path
            else:
                rec, path = oracles.mbest_1(r_s[k, 1:].astype(np.float64),
                                            vq_bl_books)
                r_q[k, 1:] = rec
        prev = (f_out + r_q).astype(np.float32)
        c_in[:, t] = prev
    return c_in, idx_scl, idx_vq


def test_encoder_scan_matches_python_loop(model, codebooks):
    """The fused scan must reproduce a frame-by-frame encode exactly,
    including bit-exact codebook indices."""
    feat = (RNG.randn(3, 12, 20) * 0.3).astype(np.float32)
    out = fp.encoder(model, jnp.asarray(feat), l1=0.09, l2=0.28,
                     codebooks=codebooks, qtz=True)
    want_c, want_iscl, want_ivq = _encode_loop_oracle(
        model, codebooks, feat, 0.09, 0.28)
    np.testing.assert_allclose(np.asarray(out["c_in"])[..., :18], want_c,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out["indices"]["scl"]),
                                  want_iscl)
    np.testing.assert_array_equal(np.asarray(out["indices"]["vq"]),
                                  want_ivq)


def test_encoder_no_qtz_masks_residuals(model):
    feat = (RNG.randn(2, 10, 20) * 0.3).astype(np.float32)
    out = fp.encoder(model, jnp.asarray(feat), l1=0.09, l2=0.28, qtz=False)
    r = np.asarray(out["r"])
    r_under = np.asarray(out["r_under"])
    ind1 = np.asarray(out["ind1"])
    # kept and under parts are complementary
    assert np.all((r[..., 0] != 0) <= ind1)
    assert np.all((r_under[..., 0] != 0) <= ~ind1)
    # pitch passthrough
    np.testing.assert_allclose(np.asarray(out["c_in"])[..., 18:],
                               feat[..., 18:])


def test_decoder_inverts_encoder(model, codebooks):
    feat = (RNG.randn(2, 15, 20) * 0.3).astype(np.float32)
    enc = fp.encoder(model, jnp.asarray(feat), l1=0.09, l2=0.28,
                     codebooks=codebooks, qtz=True)
    dec = fp.decoder(model, jnp.asarray(feat[..., 18:]), enc["r_qtz"])
    np.testing.assert_allclose(np.asarray(dec), np.asarray(enc["c_in"]),
                               rtol=1e-5, atol=1e-6)


def test_mask_enc_soft_is_differentiable(model):
    feat = (RNG.randn(2, 8, 20) * 0.3).astype(np.float32)

    def loss_fn(params):
        out = fp.mask_enc(params, jnp.asarray(feat), scale=1.0, qtz=False)
        return jnp.mean(jnp.square(out["c_in"][:, :-1, :18]
                                   - feat[:, 1:, :18]))

    g = jax.grad(loss_fn)(model)
    norms = [float(jnp.sum(jnp.abs(x)))
             for x in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(norms))
    assert sum(norms) > 0


def test_mask_enc_qtz_path(model, codebooks):
    feat = (RNG.randn(2, 8, 20) * 0.3).astype(np.float32)
    out = fp.mask_enc(model, jnp.asarray(feat), scale=1000.0,
                      codebooks=codebooks, qtz=True)
    assert out["c_in"].shape == (2, 8, 20)
    assert "indices" in out


def test_usage_counts(model, codebooks):
    feat = (RNG.randn(2, 30, 20) * 0.3).astype(np.float32)
    enc = fp.encoder(model, jnp.asarray(feat), l1=0.09, l2=0.28,
                     codebooks=codebooks, qtz=True)
    counts = fp.usage_counts(codebooks, enc["indices"])
    # scl + scl_bl counts cover every frame
    assert int(counts[0].sum() + counts[1].sum()) == 2 * 30
    # each above-threshold VQ stage fires as often as stage 0
    assert int(counts[2].sum()) == int(counts[3].sum())
