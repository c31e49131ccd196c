"""Codec quality metrics.

Coded-feature MSE (the BASELINE parity metric), log-spectral distance,
and segmental SNR for vocoded audio.  (PESQ requires an external
licensed implementation; LSD over the codec's own Bark bands is the
in-framework proxy.)
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


def segmental_snr(ref: np.ndarray, test: np.ndarray,
                  seg: int = 160) -> float:
    n = min(len(ref), len(test)) // seg * seg
    r = np.asarray(ref[:n]).reshape(-1, seg)
    t = np.asarray(test[:n]).reshape(-1, seg)
    num = np.sum(r * r, axis=1)
    den = np.sum((r - t) ** 2, axis=1) + 1e-12
    snr = 10.0 * np.log10(num / den + 1e-12)
    return float(np.mean(np.clip(snr, -10.0, 35.0)))
