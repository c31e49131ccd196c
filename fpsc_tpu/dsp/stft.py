"""STFT / mel helpers (jnp).

Mirrors reference src/utils.py:57-79 and src/models/modules.py:128-151:
1024-point STFT with hop 256 and linear/log magnitude, plus a mel
filterbank construction (Slaney-style) for the spectral losses.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def stft_mag(y: jax.Array, n_fft: int = 1024, hop: int = 256,
             scale: str = "linear") -> jax.Array:
    """y: (..., T) -> (..., n_fft//2+1, n_frames) magnitudes.

    Rectangular window and reflect-free centre padding to match the
    reference's torch.stft(..., window=None) defaults as closely as a
    pure-jnp implementation allows.
    """
    t = y.shape[-1]
    pad = n_fft // 2
    yp = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    n_frames = 1 + (yp.shape[-1] - n_fft) // hop
    idx = (np.arange(n_fft)[None, :]
           + hop * np.arange(n_frames)[:, None])   # (F, n_fft)
    frames = yp[..., idx]                           # (..., F, n_fft)
    spec = jnp.fft.rfft(frames, axis=-1)
    mag = jnp.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-10)
    mag = jnp.swapaxes(mag, -1, -2)                 # (..., bins, F)
    if scale == "log":
        return 2.0 * jnp.log(jnp.clip(mag, 1e-10, None))
    return mag


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_filterbank(n_mels: int, n_fft: int = 1024, sr: int = 16000,
                   f_min: float = 125.0, f_max: float = 7600.0
                   ) -> np.ndarray:
    """(n_fft//2+1, n_mels) triangular mel filterbank."""
    bins = n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2, bins)
    mels = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    pts = _mel_to_hz(mels)
    fb = np.zeros((bins, n_mels), np.float32)
    for m in range(n_mels):
        lo, ctr, hi = pts[m], pts[m + 1], pts[m + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - freqs) / max(hi - ctr, 1e-9)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb


def mel_spec(y: jax.Array, n_mels: int = 80, n_fft: int = 1024,
             hop: int = 256) -> jax.Array:
    mag = stft_mag(y, n_fft, hop)
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft))
    return jnp.einsum("...bf,bm->...mf", mag ** 2, fb)
