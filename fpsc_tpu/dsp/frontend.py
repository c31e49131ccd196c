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

import functools

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

    Frames whose even-grid peak correlation is <= 0 report PITCH_MAX
    with corr 0 directly — stages 2-3 are skipped for them, so an
    odd-lag refinement cannot flip an unvoiced frame to voiced with
    near-zero confidence.
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
    # frames unvoiced at the grid skip stages 2-3 entirely (the C++
    # mirror early-returns for them)
    grid_voiced = best_corr > 0.0

    # stage 2: sub-lag (octave) preference - both candidates are
    # judged against the ORIGINAL peak, smallest passing lag wins
    def grid_corr(div):
        # round-half-up (NOT np.round's half-even: the C++ mirror uses
        # floor(x + .5) and the two must take identical branches)
        cand = np.clip(2 * np.floor(best_lag / (2.0 * div) + 0.5),
                       PITCH_MIN, PITCH_MAX).astype(np.int64)
        c = corr[rows, (cand - PITCH_MIN) // 2]
        ok = ((c > OCTAVE_THRESHOLD * best_corr) & (cand < best_lag)
              & grid_voiced)
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
        take = (c > best_corr) & grid_voiced
        best_lag = np.where(take, cand, best_lag)
        best_corr = np.where(take, c, best_corr)

    best_lag = np.where(grid_voiced, best_lag, PITCH_MAX)
    best_corr = np.where(grid_voiced, np.maximum(best_corr, 0.0), 0.0)
    out = np.stack([(best_lag - 100.0) / 50.0, best_corr - 0.5], 1)
    return out.astype(np.float32)


def _pitch_from_corr_table(corr_table: jax.Array) -> jax.Array:
    """Stages 1-3 of the pitch search as gathers/wheres on the
    (T, PITCH_MAX - WINDOW? no: (T, 257)) integer-lag correlation
    table, where column j0 holds the normalised correlation at lag
    (PITCH_MAX - j0).  Mirrors estimate_pitch decision-for-decision.
    """
    n_frames = corr_table.shape[0]
    rows = jnp.arange(n_frames)

    def at_lag(lag):
        return corr_table[rows, PITCH_MAX - lag]

    lags = jnp.arange(PITCH_MIN, PITCH_MAX + 1, 2)
    grid = corr_table[:, PITCH_MAX - lags]            # (T, L) lag order
    best = jnp.argmax(grid, axis=1)                   # first max: small lag
    best_corr = grid[rows, best]
    best_lag = lags[best]
    grid_voiced = best_corr > 0.0

    def octave(div):
        cand = jnp.clip(
            2 * jnp.floor(best_lag / (2.0 * div) + 0.5),
            PITCH_MIN, PITCH_MAX).astype(jnp.int32)
        c = at_lag(cand)
        ok = ((c > OCTAVE_THRESHOLD * best_corr) & (cand < best_lag)
              & grid_voiced)
        return cand, c, ok

    cand2, c2, ok2 = octave(2)
    cand3, c3, ok3 = octave(3)
    best_lag = jnp.where(ok3, cand3, jnp.where(ok2, cand2, best_lag))
    best_corr = jnp.where(ok3, c3, jnp.where(ok2, c2, best_corr))

    for delta in (-1, 1):
        cand = jnp.clip(best_lag + delta, PITCH_MIN, PITCH_MAX)
        c = at_lag(cand)
        take = (c > best_corr) & grid_voiced
        best_lag = jnp.where(take, cand, best_lag)
        best_corr = jnp.where(take, c, best_corr)

    best_lag = jnp.where(grid_voiced, best_lag, PITCH_MAX)
    best_corr = jnp.where(grid_voiced, jnp.maximum(best_corr, 0.0), 0.0)
    return jnp.stack([(best_lag - 100.0) / 50.0, best_corr - 0.5], 1)


# Frames per correlation slab: the (SLAB, 257, 320) unfolded-window
# batched matmul is the compiled unit (bounds live memory to ~85 MB
# and keeps the XLA program small); utterances are processed as
# lax.map over slabs.
PITCH_SLAB = 256


def _slab_corr_table(ctx: jax.Array) -> jax.Array:
    """(S, 576) contexts -> (S, 257) normalised correlations, column
    j0 = lag (PITCH_MAX - j0).  The last 320 context samples ARE the
    analysis segment; num is a batched matvec over unfolded windows
    (MXU), window energies a prefix-sum difference."""
    n = ctx.shape[0]
    seg = ctx[:, PITCH_MAX:]                          # (S, 320)
    idx = jnp.arange(PITCH_MAX + 1)[:, None] + jnp.arange(
        C.WINDOW_SIZE)[None, :]
    refs = ctx[:, idx]                                # (S, 257, 320)
    num = jax.lax.dot_general(
        refs, seg, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)          # (S, 257)
    cs = jnp.cumsum(jnp.concatenate(
        [jnp.zeros((n, 1)), ctx.astype(jnp.float32) ** 2], 1), axis=1)
    er = cs[:, C.WINDOW_SIZE:] - cs[:, :-C.WINDOW_SIZE] + 1e-9
    e0 = er[:, PITCH_MAX]                             # lag 0 == segment
    return num / jnp.sqrt(e0[:, None] * er)


def estimate_pitch_jnp(x: jax.Array, n_frames: int) -> jax.Array:
    """On-device (jittable) open-loop pitch search.

    Same 3-stage search as estimate_pitch (the NumPy oracle) but the
    whole (T, lags) correlation grid comes from tensor programs XLA
    maps to the MXU/VPU:

    * every candidate reference window of frame t lives inside a
      576-sample context ctx[t] = pad[160 t : 160 t + 576] (the last
      320 samples ARE the analysis segment), so ALL integer-lag
      cross-correlations are a batched matvec over unfolded windows,
      num[t, j0] = sum_w ctx[t, j0 + w] * seg[t, w]   (j0 = 256 - lag),
      evaluated in PITCH_SLAB-frame slabs under lax.map,
    * window energies are a prefix-sum difference over ctx^2,
    * stages 1-3 (grid argmax with smallest-lag ties, octave
      suppression, +-1 refinement) are gathers/wheres on the table
      (_pitch_from_corr_table).

    f32 with Precision.HIGHEST (the NumPy oracle runs f64); knife-edge
    argmax flips where two lags correlate within f32 noise are the
    only permitted divergence — tests/test_frontend.py bounds them.
    n_frames must be static under jit (it is shape-derived).
    """
    x = jnp.asarray(x, jnp.float32)
    pad = jnp.concatenate([jnp.zeros(PITCH_MAX, jnp.float32), x])
    if n_frames == 0:
        return jnp.zeros((0, 2), jnp.float32)
    span = PITCH_MAX + C.WINDOW_SIZE                  # 576
    n_slabs = -(-n_frames // PITCH_SLAB)
    t_pad = n_slabs * PITCH_SLAB
    need = C.FRAME_SIZE * (t_pad - 1) + span
    pad = jnp.pad(pad, (0, max(0, need - pad.shape[0])))
    idx = (C.FRAME_SIZE * jnp.arange(t_pad)[:, None]
           + jnp.arange(span)[None, :])
    ctx = pad[idx].reshape(n_slabs, PITCH_SLAB, span)
    corr_table = jax.lax.map(_slab_corr_table, ctx).reshape(t_pad, -1)
    return _pitch_from_corr_table(corr_table[:n_frames])


def preemphasis_jnp(x: jax.Array, coef: float = 0.85) -> jax.Array:
    x = jnp.asarray(x, jnp.float32)
    return jnp.concatenate([x[:1], x[1:] - jnp.float32(coef) * x[:-1]])


def extract_features(x: jax.Array, preemph: float = 0.85) -> jax.Array:
    """Fully-jitted waveform -> (n_frames, 36) feature rows.

    The on-TPU counterpart of extract_features_np (which remains the
    NumPy oracle; cpp/feature_extractor.cpp is the bit-parity C++
    mirror): pre-emphasis, Vorbis-window cepstra, the 3-stage pitch
    search and ceps2lpc all run as ONE compiled XLA program, so
    corpus preparation can batch utterances on the chip
    (SURVEY §2.2: "batched JAX re-implementation ... so the whole
    frontend can run on-TPU").

    The frame count is padded up to a PITCH_SLAB multiple before the
    jit call so the compiled program is keyed on the BUCKET, not the
    exact utterance length (XLA compiles once per bucket; the zero
    tail frames are computed and dropped).
    """
    n_frames = max(0, int(x.shape[0]) // C.FRAME_SIZE - 1)
    if n_frames == 0:
        return jnp.zeros((0, 36), jnp.float32)
    t_pad = -(-n_frames // PITCH_SLAB) * PITCH_SLAB
    x = jnp.asarray(x, jnp.float32)
    need = C.FRAME_SIZE * (t_pad + 1)
    if x.shape[0] < need:
        x = jnp.pad(x, (0, need - x.shape[0]))
    else:
        x = x[:need]
    return _extract_features_jit(x, t_pad, float(preemph))[:n_frames]


@functools.partial(jax.jit, static_argnums=(1, 2))
def _extract_features_jit(x: jax.Array, n_frames: int,
                          preemph: float) -> jax.Array:
    if preemph:
        x = preemphasis_jnp(x, preemph)
    idx = (jnp.arange(C.WINDOW_SIZE)[None, :]
           + C.FRAME_SIZE * jnp.arange(n_frames)[:, None])
    frames = jnp.pad(x, (0, max(0, C.FRAME_SIZE * (n_frames + 1)
                                - x.shape[0])))[idx]
    ceps = frames_to_cepstra(frames)
    pitch = estimate_pitch_jnp(x, n_frames)
    _, lpc, _ = ceps2lpc(ceps)
    return jnp.concatenate([ceps, pitch, lpc], axis=1)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _extract_features_vjit(xs: jax.Array, n_frames: int,
                           preemph: float) -> jax.Array:
    """(B, samples) same-bucket waveforms -> (B, n_frames, 36)."""
    return jax.vmap(lambda x: _extract_features_jit(x, n_frames,
                                                    preemph))(xs)


def extract_features_batch(waves, preemph: float = 0.85):
    """Batched corpus analysis: a list of waveforms -> list of
    (n_frames_i, 36) arrays.

    Groups utterances into PITCH_SLAB frame buckets, pads each group
    to its bucket length and runs ONE vmapped XLA program per bucket —
    the whole corpus shares a handful of compiles and each dispatch
    carries a full batch (the single-utterance path is dispatch-bound
    through the dev tunnel: ~80 ms/call vs 27 ms of device time for
    10 s of audio).  SURVEY §2.2's "batched across utterances"
    frontend."""
    metas = []
    for i, x in enumerate(waves):
        n_frames = max(0, int(np.shape(x)[0]) // C.FRAME_SIZE - 1)
        t_pad = -(-n_frames // PITCH_SLAB) * PITCH_SLAB if n_frames \
            else 0
        metas.append((i, n_frames, t_pad))
    out = [None] * len(waves)
    by_bucket = {}
    for i, n_frames, t_pad in metas:
        if n_frames == 0:
            out[i] = np.zeros((0, 36), np.float32)
        else:
            by_bucket.setdefault(t_pad, []).append((i, n_frames))
    for t_pad, members in sorted(by_bucket.items()):
        need = C.FRAME_SIZE * (t_pad + 1)
        stack = np.zeros((len(members), need), np.float32)
        for row, (i, _) in enumerate(members):
            x = np.asarray(waves[i], np.float32)[:need]
            stack[row, :x.shape[0]] = x
        feats = np.asarray(_extract_features_vjit(
            jnp.asarray(stack), t_pad, float(preemph)))
        for row, (i, n_frames) in enumerate(members):
            out[i] = feats[row, :n_frames]
    return out


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
