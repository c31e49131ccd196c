"""Codec quality metrics.

Coded-feature MSE (the BASELINE parity metric), log-spectral distance,
and segmental SNR for vocoded audio.  (PESQ requires an external
licensed implementation; the in-framework perceptual family is LSD
over the codec's own Bark bands + STFT-LSD here, STOI in
`eval/stoi.py`, and the ViSQOL-family NSIM in `eval/nsim.py`.)
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from fpsc_tpu.dsp import constants as C
from fpsc_tpu.dsp.frontend import frames_to_cepstra, frame_signal


def coded_feature_mse(coded: np.ndarray, original: np.ndarray,
                      n_dims: int = C.NB_BANDS) -> float:
    """Mean squared error over the cepstral channels (normalised
    feature space, the reference's parity quantity)."""
    return float(np.mean((np.asarray(coded)[..., :n_dims]
                          - np.asarray(original)[..., :n_dims]) ** 2))


def log_spectral_distance(x: np.ndarray, y: np.ndarray) -> float:
    """Mean Bark-cepstral distance (dB-like) between two waveforms."""
    n = min(len(x), len(y))
    cx = np.asarray(frames_to_cepstra(jnp.asarray(frame_signal(x[:n]))))
    cy = np.asarray(frames_to_cepstra(jnp.asarray(frame_signal(y[:n]))))
    m = min(len(cx), len(cy))
    return float(np.sqrt(np.mean((cx[:m] - cy[:m]) ** 2)))


def stft_log_spectral_distance(x: np.ndarray, y: np.ndarray,
                               n_fft: int = 512,
                               hop: int = 160,
                               floor_db: float = -60.0) -> float:
    """Classic STFT-domain LSD in dB: RMS over frames of the per-bin
    log-magnitude difference.  Independent of the codec's own Bark
    analysis (unlike log_spectral_distance, which scores the vocoder
    with the same frontend that produced its features), so it is the
    honest external quality number."""
    n = min(len(x), len(y))
    x, y = np.asarray(x[:n], np.float64), np.asarray(y[:n], np.float64)
    win = np.hanning(n_fft)
    n_frames = max(0, (n - n_fft) // hop + 1)
    if n_frames == 0:
        return 0.0
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    sx = np.abs(np.fft.rfft(x[idx] * win, axis=-1))
    sy = np.abs(np.fft.rfft(y[idx] * win, axis=-1))
    ref = max(sx.max(), 1e-12)
    lx = 20.0 * np.log10(np.maximum(sx / ref, 10 ** (floor_db / 20.0)))
    ly = 20.0 * np.log10(np.maximum(sy / ref, 10 ** (floor_db / 20.0)))
    return float(np.mean(np.sqrt(np.mean((lx - ly) ** 2, axis=-1))))


def segmental_snr(ref: np.ndarray, test: np.ndarray,
                  seg: int = 160) -> float:
    n = min(len(ref), len(test)) // seg * seg
    r = np.asarray(ref[:n]).reshape(-1, seg)
    t = np.asarray(test[:n]).reshape(-1, seg)
    num = np.sum(r * r, axis=1)
    den = np.sum((r - t) ** 2, axis=1) + 1e-12
    snr = 10.0 * np.log10(num / den + 1e-12)
    return float(np.mean(np.clip(snr, -10.0, 35.0)))
