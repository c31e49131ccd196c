"""NSIM metric tests: oracle parity (vectorized SSIM-style map vs the
per-pixel scalar loop), gammatone filterbank design checks (peak
response at each centre frequency, unit peak gain, ERB spacing), and
metric axioms (identity -> 1, monotone degradation with noise, gain
invariance after level alignment)."""
import numpy as np
import pytest

from fpsc_tpu.eval import nsim as ns
from fpsc_tpu.data.synthetic import speech_like_waveform


def _speech(seconds=2.0, seed=0):
    n = int(16000 * seconds)
    x = np.asarray(
        speech_like_waveform(np.random.RandomState(seed), n), np.float64)
    return x / (np.abs(x).max() + 1e-9)


def test_erb_space_monotone_and_bounded():
    fcs = ns.erb_space()
    assert len(fcs) == ns.N_BANDS
    assert fcs[0] == pytest.approx(ns.FMIN, rel=1e-6)
    assert fcs[-1] == pytest.approx(ns.FMAX, rel=1e-6)
    assert np.all(np.diff(fcs) > 0)
    # ERB spacing: ratios between adjacent centres grow with frequency
    assert np.all(np.diff(np.diff(fcs)) > 0)


def test_gammatone_peaks_at_centre_frequency():
    for fc in [100.0, 500.0, 2000.0, 6000.0]:
        g = ns.gammatone_fir(fc)
        H = np.abs(np.fft.rfft(g, 1 << 15))
        freqs = np.fft.rfftfreq(1 << 15, 1.0 / ns.FS)
        peak_f = freqs[np.argmax(H)]
        assert abs(peak_f - fc) / fc < 0.05, (fc, peak_f)
        # unit gain at the design frequency (the normalisation target)
        k = int(round(fc / ns.FS * (1 << 15)))
        assert H[k] == pytest.approx(1.0, abs=1e-2)


def test_neurogram_tone_lands_in_right_band():
    t = np.arange(16000) / 16000.0
    x = np.sin(2 * np.pi * 1000.0 * t)
    fcs = ns.erb_space()
    env = ns.neurogram(x, 16000, fcs)
    hot = int(np.argmax(env.mean(axis=1)))
    assert abs(fcs[hot] - 1000.0) / 1000.0 < 0.15, fcs[hot]


def test_nsim_map_matches_loop_oracle():
    rng = np.random.RandomState(0)
    r = rng.rand(12, 17) * 60.0
    d = np.clip(r + rng.randn(12, 17) * 6.0, 0.0, 60.0)
    fast = ns.nsim_map(r, d)
    slow = ns._nsim_map_loop(r, d)
    assert fast.shape == slow.shape == (10, 15)
    assert np.abs(fast - slow).max() < 1e-10


def test_identity_scores_one():
    x = _speech(1.5, seed=3)
    assert ns.nsim(x, x) == pytest.approx(1.0, abs=1e-9)


def test_gain_invariant_after_level_alignment():
    x = _speech(1.5, seed=5)
    assert ns.nsim(x, 0.25 * x) == pytest.approx(1.0, abs=1e-9)


def test_monotone_with_noise():
    x = _speech(2.0, seed=4)
    noise = _speech(2.0, seed=40)[:len(x)]
    scores = []
    for snr_db in [30.0, 10.0, 0.0, -10.0]:
        g = 10.0 ** (-snr_db / 20.0) * np.std(x) / np.std(noise)
        scores.append(ns.nsim(x, x + g * noise))
    assert scores[0] > 0.85
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[-1] < 0.6, scores


def test_too_short_raises():
    with pytest.raises(ValueError):
        ns.nsim(np.zeros(100), np.zeros(100))
