"""DSP-layer golden tests against the scalar oracles."""
import numpy as np
import pytest

import jax.numpy as jnp

from fpsc_tpu.dsp import ceps2lpc as c2l
from fpsc_tpu.dsp import constants as C
from fpsc_tpu.dsp import entropy as ent
from fpsc_tpu.dsp import lpc as lpcmod
from fpsc_tpu.dsp import mulaw

import oracles


RNG = np.random.RandomState(1234)


def _fake_cepstra(n):
    """Plausible Bark cepstra: c0 around -1..2, decaying higher bins."""
    base = RNG.randn(n, C.NB_BANDS) * (1.0 / (1.0 + np.arange(C.NB_BANDS)))
    base[:, 0] = RNG.uniform(-2.0, 2.0, n)
    return base.astype(np.float32)


def test_idct_matches_oracle():
    x = _fake_cepstra(7)
    got = np.asarray(c2l.idct(jnp.asarray(x)))
    want = np.stack([oracles.idct_1(v.astype(np.float64)) for v in x])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dct_roundtrip():
    x = _fake_cepstra(5)
    got = np.asarray(c2l.dct(c2l.idct(jnp.asarray(x))))
    np.testing.assert_allclose(got, x, rtol=1e-4, atol=1e-4)


def test_interp_band_gain_matches_oracle():
    e = np.abs(RNG.randn(4, C.NB_BANDS)).astype(np.float32)
    got = np.asarray(c2l.interp_band_gain(jnp.asarray(e)))
    want = np.stack([oracles.interp_1(v.astype(np.float64)) for v in e])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert np.all(got[:, -1] == 0.0)  # last bin untouched


def test_levinson_matches_oracle():
    # Random valid autocorrelations from random power spectra.
    spec = np.abs(RNG.randn(16, C.FREQ_SIZE)).astype(np.float64) + 0.1
    ac = np.fft.irfft(spec, axis=-1)[:, :C.LPC_ORDER + 1]
    ac[:, 0] += ac[:, 0] * 1e-4 + 0.7
    err, lpc, rc = c2l.levinson(jnp.asarray(ac, jnp.float32))
    for row in range(ac.shape[0]):
        e1, l1, r1 = oracles.levinson_1(ac[row])
        np.testing.assert_allclose(np.asarray(lpc)[row], l1,
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(float(err[row]), e1, rtol=2e-3)


def test_levinson_early_exit_freezes_rows():
    """A near-perfectly-predictable row must stop updating once the
    30 dB-gain exit fires (tail lpc coefficients stay 0)."""
    # AR(1) process autocorrelation: ac[k] = rho^k -> Levinson solves it
    # exactly at order 1, error collapses, exit fires immediately.
    rho = 0.999
    ac = rho ** np.arange(C.LPC_ORDER + 1)
    ac = ac[None].astype(np.float32)
    err, lpc, rc = c2l.levinson(jnp.asarray(ac))
    e1, l1, r1 = oracles.levinson_1(ac[0].astype(np.float64))
    np.testing.assert_allclose(np.asarray(lpc)[0], l1, rtol=1e-3, atol=1e-4)


def test_levinson_zero_row():
    ac = np.zeros((1, C.LPC_ORDER + 1), np.float32)
    err, lpc, rc = c2l.levinson(jnp.asarray(ac))
    assert np.all(np.asarray(lpc) == 0.0)
    assert float(err[0]) == 0.0


def test_ceps2lpc_matches_scalar_oracle():
    cep = _fake_cepstra(12)
    err, lpc, rc = c2l.ceps2lpc(jnp.asarray(cep))
    for row in range(cep.shape[0]):
        e1, l1, r1 = oracles.ceps2lpc_1(cep[row])
        np.testing.assert_allclose(np.asarray(lpc)[row], l1,
                                   rtol=5e-3, atol=5e-3)


def test_lpc_pred_matches_scalar_filter():
    b, frames = 3, 4
    t = frames * C.FRAME_SIZE
    x = RNG.randn(b, t).astype(np.float32) * 0.1
    a = RNG.randn(b, frames, C.LPC_ORDER).astype(np.float32) * 0.05
    got = np.asarray(lpcmod.lpc_pred(jnp.asarray(x), jnp.asarray(a)))
    for i in range(b):
        want = oracles.lpc_pred_1(x[i].astype(np.float64),
                                  a[i].astype(np.float64))
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_excitation_definition():
    """exc[t] = x[t] - pred[t-1] with pred rolled (reference
    src/train.py:126)."""
    x = RNG.randn(1, 320).astype(np.float32)
    a = RNG.randn(1, 2, 16).astype(np.float32) * 0.1
    exc, pred = lpcmod.excitation(jnp.asarray(x), jnp.asarray(a))
    want = x - np.roll(np.asarray(pred), 1, axis=-1)
    np.testing.assert_allclose(np.asarray(exc), want, rtol=1e-6)


def test_lpc_synthesis_inverts_excitation():
    """The decoder-side synthesis IIR reconstructs x from (exc, lpc).
    Exact inverse except the first samples: excitation() inherits the
    reference's roll() WRAPAROUND (exc[0] folds in pred[T-1],
    src/train.py:126), so the boundary error decays through the IIR."""
    rng = np.random.RandomState(17)     # local: arbitrary random LPC
    x = (rng.randn(2, 480) * 0.3).astype(np.float32)
    # STABLE synthesis filters (real LPC from the Levinson chain, as
    # in production); arbitrary random coefficients can put IIR poles
    # outside the unit circle and amplify the t=0 boundary error
    from fpsc_tpu.dsp.ceps2lpc import ceps2lpc
    cep = (rng.randn(6, 18) * 0.4).astype(np.float32)
    _, lpc, _ = ceps2lpc(jnp.asarray(cep))
    a = np.asarray(lpc).reshape(2, 3, 16)
    exc, _ = lpcmod.excitation(jnp.asarray(x), jnp.asarray(a))
    x_rec = np.asarray(lpcmod.lpc_synthesis(exc, jnp.asarray(a)))
    # realistic (high-Q) filters ring the boundary error down slowly;
    # converged by one frame
    np.testing.assert_allclose(x_rec[:, 160:], x[:, 160:],
                               rtol=1e-3, atol=1e-4)


def test_mulaw_roundtrip_and_oracle():
    x = (RNG.uniform(-1, 1, 1000) * 32767).astype(np.float32)
    u = np.asarray(mulaw.l2u(jnp.asarray(x)))
    np.testing.assert_allclose(u, oracles.mulaw_enc_1(x), rtol=1e-4,
                               atol=1e-3)
    back = np.asarray(mulaw.u2l(jnp.asarray(u)))
    np.testing.assert_allclose(back, oracles.mulaw_dec_1(u), rtol=1e-4,
                               atol=2e-1)
    # round trip within quantisation error
    np.testing.assert_allclose(back, x, atol=1.0, rtol=0.05)


def test_mulaw_index_range():
    x = jnp.asarray([-40000.0, -1.0, 0.0, 1.0, 40000.0])
    idx = np.asarray(mulaw.l2u_index(x))
    assert idx.min() >= 0 and idx.max() <= 255
    assert idx[2] == 128


def test_histogram_entropy_uniform_vs_peaked():
    flat = RNG.uniform(0, 1, 100000)
    peaked = np.full(100000, 0.5)
    assert ent.histogram_entropy(flat) > ent.histogram_entropy(peaked)
    assert abs(ent.histogram_entropy(flat) - np.log(128)) < 0.05


def test_usage_entropy_bits():
    assert abs(ent.usage_entropy_bits(np.ones(256)) - 8.0) < 1e-6
