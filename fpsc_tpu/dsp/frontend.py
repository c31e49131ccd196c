"""Feature-extraction frontend (the in-framework `dump_data`).

The reference repo depends on xiph/LPCNet's native C feature extractor
for its .f32 inputs (reference: data_preprocess/write_small_files.py:
18-24 documents the layout; src/ceps2lpc/* hand-ports its synthesis
half).  This module is the analysis half, built so the pair
(extract -> ceps2lpc) is self-consistent:

* 20 ms Vorbis-windowed rfft at 10 ms hop,
* triangular Bark band energies via the same EBAND5MS geometry,
* log10 -> DCT-II -> 18 cepstra with the -4 c0 offset that
  ceps2lpc adds back,
* open-loop pitch (period in samples, correlation): normalised
  autocorrelation grid search + octave-error suppression + 1-sample
  refinement (see estimate_pitch; gross-error-free on known-f0
  sweeps, tests/test_frontend.py), encoded as f18 = (period - 100) /
  50 so that the reference's period recovery `int(.1 + 50*f + 100)`
  (src/train.py:123) is exact,
* 16 LPC from the cepstra via fpsc_tpu.dsp.ceps2lpc (same path the
  codec uses at decode time).

A bit-parity C++ implementation of the same math lives in cpp/ for
host-side streaming use; tests/test_frontend.py checks the two agree.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from fpsc_tpu.dsp import constants as C
from fpsc_tpu.dsp.ceps2lpc import ceps2lpc, dct

PITCH_MIN = 32     # 500 Hz
PITCH_MAX = 256    # 62.5 Hz
PITCH_CONTEXT = 320  # lookback samples for the correlation search


def vorbis_window(n: int = C.WINDOW_SIZE) -> np.ndarray:
    t = (np.arange(n) + 0.5) / n
    return np.sin(0.5 * np.pi * np.sin(np.pi * t) ** 2).astype(np.float32)


_WINDOW = vorbis_window()


@jax.jit
def frames_to_cepstra(frames: jax.Array) -> jax.Array:
    """(N, 320) signal frames -> (N, 18) Bark cepstra (c0 pre-offset
    by -4, matching what ceps2lpc expects to add back)."""
    w = frames * jnp.asarray(_WINDOW)
    spec = jnp.fft.rfft(w, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2) / C.WINDOW_SIZE
    band_e = jnp.matmul(power, jnp.asarray(C.BAND_MATRIX),
                        precision=jax.lax.Precision.HIGHEST)
    log_e = jnp.log10(band_e + 1e-7)
    ceps = dct(log_e)
    return ceps.at[:, 0].add(-4.0)


def frame_signal(x: np.ndarray) -> np.ndarray:
    """Slice x into (n_frames, 320) windows at 160-sample hop; frame t
    covers samples [t*160, t*160 + 320) (zero-padded at the tail)."""
    n_frames = max(0, len(x) // C.FRAME_SIZE - 1)
    idx = np.arange(C.WINDOW_SIZE)[None, :] + (
        np.arange(n_frames)[:, None] * C.FRAME_SIZE)
    return np.asarray(x, np.float32)[idx]


# Sub-lag acceptance fraction of the peak correlation.  Swept on
# harmonic / breathy (SNR 6 dB) / 20 dB-attenuated-fundamental /
# odd-harmonics-only sweeps (80-250 Hz): 0.7 leaves 0-1.5% gross
# errors with ZERO sub-period picks on all four; 0.85 leaves 3-6%
# period doubles (tests/test_frontend.py pins the sweep behaviour).
OCTAVE_THRESHOLD = 0.7


def estimate_pitch(x: np.ndarray, n_frames: int) -> np.ndarray:
    """(n_frames, 2) [period_feature, corr_feature] open-loop pitch.

    Three stages (mirrored exactly by cpp/feature_extractor.cpp -
    tests/test_native.py pins lag-for-lag agreement):

    1. normalised autocorrelation over the step-2 lag grid
       [PITCH_MIN, PITCH_MAX] (vectorised over all frames and lags;
       ties keep the SMALLEST lag),
    2. octave-error suppression: a harmonic-rich voice correlates as
       well at 2T/3T as at T, so argmax alone period-doubles (22%
       gross errors on a harmonic sweep -> 0% with this stage).
       Candidates round(L*/2), round(L*/3) (snapped to the even grid)
       are accepted when their correlation exceeds
       OCTAVE_THRESHOLD * peak, smallest passing lag winning - the
       classic sub-lag preference of open-loop searches (LPCNet/Opus
       practice),
    3. +-1 sample refinement around the winner (the step-2 grid alone
       quantises the period to 2 samples).

    Frames whose best correlation is <= 0 report PITCH_MAX.
    """
    pad = np.concatenate([np.zeros(PITCH_MAX, np.float32),
                          np.asarray(x, np.float32)])
    win = C.WINDOW_SIZE
    if n_frames == 0:
        return np.zeros((0, 2), np.float32)
    sw = np.lib.stride_tricks.sliding_window_view(pad, win)  # (S, 320)
    bases = PITCH_MAX + C.FRAME_SIZE * np.arange(n_frames)
    lags = np.arange(PITCH_MIN, PITCH_MAX + 1, 2)
    seg = sw[bases].astype(np.float64)                 # (T, 320)
    refs = sw[bases[:, None] - lags[None, :]].astype(np.float64)
    e0 = np.einsum("tw,tw->t", seg, seg) + 1e-9        # (T,)
    num = np.einsum("tw,tlw->tl", seg, refs)           # (T, L)
    er = np.einsum("tlw,tlw->tl", refs, refs) + 1e-9
    corr = num / np.sqrt(e0[:, None] * er)
    best = np.argmax(corr, axis=1)
    rows = np.arange(n_frames)
    best_corr = corr[rows, best]
    best_lag = lags[best]

    # stage 2: sub-lag (octave) preference - both candidates are
    # judged against the ORIGINAL peak, smallest passing lag wins
    def grid_corr(div):
        # round-half-up (NOT np.round's half-even: the C++ mirror uses
        # floor(x + .5) and the two must take identical branches)
        cand = np.clip(2 * np.floor(best_lag / (2.0 * div) + 0.5),
                       PITCH_MIN, PITCH_MAX).astype(np.int64)
        c = corr[rows, (cand - PITCH_MIN) // 2]
        ok = (c > OCTAVE_THRESHOLD * best_corr) & (cand < best_lag)
        return cand, c, ok

    cand2, c2, ok2 = grid_corr(2)
    cand3, c3, ok3 = grid_corr(3)
    best_lag = np.where(ok3, cand3, np.where(ok2, cand2, best_lag))
    best_corr = np.where(ok3, c3, np.where(ok2, c2, best_corr))

    # stage 3: +-1 refinement (direct correlations at the odd lags)
    def corr_at(lag_arr):
        ref = sw[bases - lag_arr].astype(np.float64)
        n = np.einsum("tw,tw->t", seg, ref)
        e = np.einsum("tw,tw->t", ref, ref) + 1e-9
        return n / np.sqrt(e0 * e)

    for delta in (-1, 1):
        cand = np.clip(best_lag + delta, PITCH_MIN, PITCH_MAX)
        c = corr_at(cand)
        take = c > best_corr
        best_lag = np.where(take, cand, best_lag)
        best_corr = np.where(take, c, best_corr)

    best_lag = np.where(best_corr > 0.0, best_lag, PITCH_MAX)
    best_corr = np.maximum(best_corr, 0.0)
    out = np.stack([(best_lag - 100.0) / 50.0, best_corr - 0.5], 1)
    return out.astype(np.float32)


def extract_features_np(x: np.ndarray,
                        preemph: float = 0.85) -> np.ndarray:
    """Waveform -> (n_frames, 36) feature rows
    [ceps(18) | period | corr | lpc(16)].

    Pre-emphasises internally (LPCNet dump_data semantics, coef 0.85)
    so the analysis domain matches the synthesis-side de-emphasis
    (reference src/models/wavenet.py:188); pass preemph=0.0 to analyse
    the raw signal.  Training PCM must be pre-emphasised with the same
    coefficient (fpsc_tpu.data.prepare does this)."""
    if preemph:
        from fpsc_tpu.dsp.emphasis import preemphasis
        x = preemphasis(x, preemph)
    frames = frame_signal(x)
    ceps = np.asarray(frames_to_cepstra(jnp.asarray(frames)))
    pitch = estimate_pitch(x, frames.shape[0])
    _, lpc, _ = ceps2lpc(jnp.asarray(ceps))
    return np.concatenate([ceps, pitch, np.asarray(lpc)],
                          axis=1).astype(np.float32)
