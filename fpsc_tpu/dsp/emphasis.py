"""Pre-/de-emphasis pair (LPCNet `dump_data` semantics).

The LPCNet toolchain the reference depends on pre-emphasises the
signal (y[n] = x[n] - 0.85 x[n-1]) before analysis, trains the vocoder
in that domain, and inverts it at synthesis with the de-emphasis IIR
y[n] = s[n] + 0.85 y[n-1] (the reference carries the synthesis half at
src/models/wavenet.py:188; our samplers do the same).  Round 1 applied
only the synthesis half - a baked-in 1/(1 - 0.85 z^-1) low-shelf boost
that was never applied at analysis.  This module is the analysis half;
fpsc_tpu.dsp.frontend / cpp/feature_extractor.cpp apply it before
feature extraction and fpsc_tpu.data.prepare stores pre-emphasised
training PCM, closing the chain:

    x --preemphasis--> s --[analysis, training, codec, vocoder]--> s_hat
      --deemphasis--> x_hat
"""
from __future__ import annotations

import numpy as np

PREEMPH = 0.85


def preemphasis(x: np.ndarray, coef: float = PREEMPH) -> np.ndarray:
    """y[n] = x[n] - coef * x[n-1] (zero initial memory), last axis."""
    x = np.asarray(x, np.float32)
    y = x.copy()
    y[..., 1:] = x[..., 1:] - np.float32(coef) * x[..., :-1]
    return y


def deemphasis(s: np.ndarray, coef: float = PREEMPH) -> np.ndarray:
    """Inverse IIR y[n] = s[n] + coef * y[n-1]; exact inverse of
    preemphasis (same zero initial memory)."""
    s64 = np.asarray(s, np.float64)
    try:
        from scipy.signal import lfilter
        y = lfilter([1.0], [1.0, -float(coef)], s64, axis=-1)
    except ImportError:
        y = np.empty_like(s64)
        acc = np.zeros(s64.shape[:-1])
        for n in range(s64.shape[-1]):
            acc = s64[..., n] + coef * acc
            y[..., n] = acc
    return y.astype(np.float32)
