"""Frontend pitch-search accuracy on known-f0 sweeps.

The open-loop search (dsp/frontend.py::estimate_pitch) must track a
ground-truth f0 sweep without octave errors across signal families:
harmonic-rich, breathy (SNR ~6 dB), 20 dB-attenuated fundamental
(telephone-ish), and odd-harmonics-dominant (the classic half-period
trap for aggressive sub-lag preference)."""
import numpy as np

from fpsc_tpu.dsp import constants as C
from fpsc_tpu.dsp.frontend import estimate_pitch


def _sweep(rng, n, lo=80.0, hi=250.0):
    t = np.arange(n) / C.SAMPLE_RATE
    f0 = lo * (hi / lo) ** (t / t[-1])
    phase = 2 * np.pi * np.cumsum(f0) / C.SAMPLE_RATE
    return f0, phase


def _metrics(x, f0):
    x = (x / np.abs(x).max()).astype(np.float32)
    n_frames = len(x) // C.FRAME_SIZE - 1
    true_p = C.SAMPLE_RATE / f0[np.arange(n_frames) * C.FRAME_SIZE + 160]
    valid = (true_p >= 34) & (true_p <= 254)
    est = estimate_pitch(x, n_frames)[:, 0] * 50 + 100
    rel = np.abs(est - true_p) / true_p
    gross = float(np.mean(rel[valid] > 0.2))
    ok = valid & (rel < 0.2)
    mae = float(np.mean(np.abs(est - true_p)[ok]))
    sub = float(np.mean((est[valid] / true_p[valid]) < 0.6))
    return gross, mae, sub


def test_pitch_sweep_families():
    rng = np.random.RandomState(1)
    n = C.SAMPLE_RATE * 3
    f0, phase = _sweep(rng, n)
    harm = sum(1.0 / (1 + 0.3 * k) * np.sin(k * phase + rng.uniform(0, 6))
               for k in range(1, 30))
    weak = sum((0.1 if k == 1 else 1.0 / (1 + 0.3 * k))
               * np.sin(k * phase + rng.uniform(0, 6))
               for k in range(1, 30))
    odd = sum((1.0 / (1 + 0.3 * k) if k % 2 == 1 else 0.02)
              * np.sin(k * phase + rng.uniform(0, 6))
              for k in range(1, 30))
    cases = {
        "harmonic": harm + 0.01 * rng.randn(n),
        "breathy": harm + 0.5 * np.std(harm) * rng.randn(n),
        "weak_f0": weak + 0.01 * rng.randn(n),
        "odd_harm": odd + 0.01 * rng.randn(n),
    }
    for name, x in cases.items():
        gross, mae, sub = _metrics(x, f0)
        # pre-octave-suppression the plain argmax search had 15-25%
        # gross (period-doubling) errors on these
        assert gross < 0.05, f"{name}: gross error rate {gross}"
        assert mae < 0.6, f"{name}: MAE {mae} samples"
        # the sub-lag preference must never flip to half-period
        assert sub == 0.0, f"{name}: sub-period picks {sub}"


def test_pitch_unvoiced_reports_floor():
    rng = np.random.RandomState(2)
    x = rng.randn(C.SAMPLE_RATE).astype(np.float32)
    out = estimate_pitch(x, len(x) // C.FRAME_SIZE - 1)
    corr = out[:, 1] + 0.5
    assert float(np.mean(corr)) < 0.45   # noise: low correlation


def test_grid_unvoiced_frames_skip_refinement():
    """A frame whose even-grid peak correlation is <= 0 must report
    PITCH_MAX / corr 0 — the odd-lag refinement may not flip it to
    voiced with near-zero confidence (advisor round-2 finding).
    The grid-unvoiced set is re-derived here with a naive loop.
    (White noise always correlates positively at SOME of the 113 grid
    lags, so the fixture needs silent spans: an all-zero segment has
    correlation exactly 0 at every lag.)"""
    from fpsc_tpu.dsp.frontend import (PITCH_MAX, PITCH_MIN)
    rng = np.random.RandomState(3)
    x = rng.randn(C.SAMPLE_RATE).astype(np.float32)
    x[4000:6000] = 0.0
    x[9000:10500] = 0.0
    n_frames = len(x) // C.FRAME_SIZE - 1
    out = estimate_pitch(x, n_frames)
    period = out[:, 0] * 50 + 100
    corr = out[:, 1] + 0.5

    pad = np.concatenate([np.zeros(PITCH_MAX, np.float32), x])
    hits = 0
    for t in range(n_frames):
        base = PITCH_MAX + C.FRAME_SIZE * t
        seg = pad[base:base + C.WINDOW_SIZE].astype(np.float64)
        peak = -np.inf
        for lag in range(PITCH_MIN, PITCH_MAX + 1, 2):
            ref = pad[base - lag:base - lag + C.WINDOW_SIZE
                      ].astype(np.float64)
            c = seg @ ref / np.sqrt((seg @ seg + 1e-9)
                                    * (ref @ ref + 1e-9))
            peak = max(peak, c)
        if peak <= 0.0:
            hits += 1
            assert period[t] == PITCH_MAX and corr[t] == 0.0, (
                t, period[t], corr[t])
    assert hits > 0, "fixture produced no grid-unvoiced frames"


def _mixed_fixture(seed=0, seconds=3):
    rng = np.random.RandomState(seed)
    n = C.SAMPLE_RATE * seconds
    f0, phase = _sweep(rng, n)
    x = sum(1.0 / (1 + 0.3 * k) * np.sin(k * phase + rng.uniform(0, 6))
            for k in range(1, 20)).astype(np.float32)
    x[16000:20000] = 0.01 * rng.randn(4000)   # noise span
    x[30000:34000] = 0.0                      # silence span
    return (x / np.abs(x).max()).astype(np.float32)


def test_jnp_pitch_matches_numpy_oracle():
    """The on-device search must make the SAME lag decisions as the
    f64 NumPy oracle; only knife-edge f32 argmax flips are allowed
    (bounded at 1%) and correlations must agree to f32 tolerance."""
    import jax.numpy as jnp
    from fpsc_tpu.dsp.frontend import estimate_pitch_jnp
    for seed in (0, 7):
        x = _mixed_fixture(seed)
        n_frames = len(x) // C.FRAME_SIZE - 1
        want = estimate_pitch(x, n_frames)
        got = np.asarray(estimate_pitch_jnp(jnp.asarray(x), n_frames))
        lag_w = np.round(want[:, 0] * 50 + 100)
        lag_g = np.round(got[:, 0] * 50 + 100)
        exact = float(np.mean(lag_w == lag_g))
        assert exact >= 0.99, f"lag agreement {exact}"
        close = np.abs(want[:, 1] - got[:, 1]) < 1e-4
        assert float(np.mean(~close & (lag_w == lag_g))) == 0.0


def test_batched_extract_features_matches_single():
    """extract_features_batch (bucket-grouped vmap) must reproduce the
    per-utterance jitted path exactly, across different lengths that
    land in different buckets."""
    import jax.numpy as jnp
    from fpsc_tpu.dsp.frontend import (extract_features,
                                       extract_features_batch)
    waves = [_mixed_fixture(0, 2), _mixed_fixture(1, 3),
             _mixed_fixture(2, 2)[:12345], np.zeros(100, np.float32)]
    got = extract_features_batch(waves)
    for x, g in zip(waves, got):
        want = np.asarray(extract_features(jnp.asarray(x)))
        assert g.shape == want.shape
        np.testing.assert_allclose(g, want, rtol=1e-5, atol=1e-5)


def test_jitted_extract_features_matches_numpy():
    """extract_features (one XLA program) vs extract_features_np."""
    import jax.numpy as jnp
    from fpsc_tpu.dsp.frontend import extract_features, extract_features_np
    x = _mixed_fixture(1)
    want = extract_features_np(x)
    got = np.asarray(extract_features(jnp.asarray(x)))
    assert want.shape == got.shape
    # compare recovered integer lags, not raw floats: XLA's f32
    # divide (reciprocal multiply) may differ from NumPy's by 1 ulp
    lag_w = np.round(want[:, 18] * 50 + 100)
    lag_g = np.round(got[:, 18] * 50 + 100)
    agree = lag_w == lag_g
    assert float(np.mean(agree)) >= 0.99        # pitch lags
    rows = agree                                 # comparable rows
    assert np.abs(want[rows, :18] - got[rows, :18]).max() < 1e-4
    assert np.abs(want[rows, 19] - got[rows, 19]).max() < 1e-4
    assert np.abs(want[rows, 20:] - got[rows, 20:]).max() < 1e-4
