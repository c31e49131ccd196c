"""Deterministic synthetic speech-like fixtures.

Lets every pipeline (training, codebooks, encode, synthesis) run
without LibriSpeech: each utterance is a harmonic source with drifting
pitch + formant-ish filtered noise; its feature track is produced by
the SAME analysis geometry the codec expects (18 Bark cepstra via the
band matrices, pitch period/corr, 16 LPC via fpsc_tpu.dsp.ceps2lpc),
so coded-feature pipelines behave realistically.
"""
from __future__ import annotations

import numpy as np

from fpsc_tpu.dsp import constants as C


def synth_waveform(rng: np.random.RandomState, n_samples: int) -> np.ndarray:
    """Voiced-ish waveform: harmonics of a drifting f0 + breath noise."""
    t = np.arange(n_samples) / C.SAMPLE_RATE
    f0 = 120.0 + 60.0 * np.sin(2 * np.pi * 0.7 * t + rng.uniform(0, 6))
    phase = 2 * np.pi * np.cumsum(f0) / C.SAMPLE_RATE
    x = np.zeros(n_samples)
    for h, amp in enumerate([1.0, 0.6, 0.45, 0.3, 0.2, 0.12], start=1):
        x += amp * np.sin(h * phase + rng.uniform(0, 6))
    # slowly varying amplitude envelope (syllable-ish)
    env = 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * 2.1 * t + rng.uniform(0, 6)))
    x = x * env + 0.03 * rng.randn(n_samples)
    x = x / max(np.abs(x).max(), 1e-10) * 0.999
    return x.astype(np.float32)


def analyze(x: np.ndarray) -> np.ndarray:
    """Waveform -> (n_frames, 36) feature rows using the codec's own
    analysis: windowed FFT band energies -> log10 -> DCT cepstra,
    autocorrelation pitch, LPC from cepstra."""
    from fpsc_tpu.dsp.frontend import extract_features_np
    return extract_features_np(x)


def synth_utterance(seed: int, n_chunks: int = 12):
    """Returns (waveform (n_chunks*2400 + pad,), windows (k, 19, 36))."""
    rng = np.random.RandomState(seed)
    n_frames = n_chunks * C.FRAMES_PER_CHUNK + 2 * C.CONTEXT_FRAMES
    n_samples = n_frames * C.FRAME_SIZE + C.OVERLAP_SIZE
    x = synth_waveform(rng, n_samples)
    frames = analyze(x)[:n_frames]
    from fpsc_tpu.data.f32 import window_features
    windows = window_features(frames)
    # waveform aligned with the non-context frames
    aligned = x[C.CONTEXT_FRAMES * C.FRAME_SIZE:
                (C.CONTEXT_FRAMES + n_chunks * C.FRAMES_PER_CHUNK)
                * C.FRAME_SIZE]
    return aligned.astype(np.float32), windows
