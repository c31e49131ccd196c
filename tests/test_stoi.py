"""STOI metric tests: oracle parity (vectorized vs per-segment loop,
resampler vs scipy), metric axioms (perfect score on identity,
monotone degradation with noise), and band-matrix geometry."""
import numpy as np
import pytest

from fpsc_tpu.eval import stoi as st
from fpsc_tpu.data.synthetic import speech_like_waveform


def _speech(seconds=3.0, seed=0):
    n = int(16000 * seconds)
    x = np.asarray(
        speech_like_waveform(np.random.RandomState(seed), n), np.float64)
    return x / (np.abs(x).max() + 1e-9)


def test_resampler_matches_scipy_oracle():
    from scipy.signal import resample_poly as scipy_rp
    rng = np.random.RandomState(0)
    x = rng.randn(16000)
    mine = st.resample_poly(x, 5, 8)
    ref = scipy_rp(x, 5, 8)
    assert mine.shape == ref.shape
    # identical geometry, same filter family; allow tiny design
    # differences away from the edges
    mid = slice(200, -200)
    err = np.abs(mine[mid] - ref[mid]).max() / np.abs(ref).max()
    assert err < 5e-3, err


def test_resampler_preserves_bandlimited_tone():
    t = np.arange(16000) / 16000.0
    x = np.sin(2 * np.pi * 1000.0 * t)
    y = st.resample_poly(x, 5, 8)
    t10 = np.arange(len(y)) / 10000.0
    ref = np.sin(2 * np.pi * 1000.0 * t10)
    assert np.abs(y[100:-100] - ref[100:-100]).max() < 1e-3


def test_band_matrix_geometry():
    obm = st.thirdoct_band_matrix()
    assert obm.shape == (15, 257)
    # bands are non-empty, disjoint and ordered
    assert (obm.sum(axis=1) > 0).all()
    assert (obm.sum(axis=0) <= 1).all()
    centers = [np.flatnonzero(row).mean() for row in obm]
    assert np.all(np.diff(centers) > 0)


def test_vectorized_matches_loop_oracle():
    x = _speech(2.0, seed=1)
    rng = np.random.RandomState(2)
    y = x + 0.1 * rng.randn(len(x))
    x10 = st._to_10k(x, 16000)
    y10 = st._to_10k(y, 16000)
    xs, ys = st.remove_silent_frames(x10, y10)
    obm = st.thirdoct_band_matrix()
    xe, ye = st._band_envelopes(xs, obm), st._band_envelopes(ys, obm)
    fast = float(st._clip_and_correlate(
        st._segment_stack(xe),
        np.ascontiguousarray(st._segment_stack(ye))).mean())
    slow = st._stoi_segments_loop(xe, ye)
    assert fast == pytest.approx(slow, abs=1e-12)


def test_identity_scores_one():
    x = _speech(2.0, seed=3)
    assert st.stoi(x, x) == pytest.approx(1.0, abs=1e-6)


def test_monotone_with_noise():
    # speech-shaped interferer (another synthetic talker) so per-band
    # SNR tracks the overall SNR — white noise under-masks the
    # low-frequency bands that carry most of the speech energy
    x = _speech(3.0, seed=4)
    noise = _speech(3.0, seed=40)[:len(x)]
    scores = []
    for snr_db in [30.0, 10.0, 0.0, -10.0]:
        g = 10.0 ** (-snr_db / 20.0) * np.std(x) / np.std(noise)
        scores.append(st.stoi(x, x + g * noise))
    assert scores[0] > 0.9
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[-1] < 0.55


def test_too_short_raises():
    x = _speech(0.2, seed=6)
    with pytest.raises(ValueError):
        st.stoi(x, x)
