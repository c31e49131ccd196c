"""Utterance-level codec: encode to indices/coded-features, decode back.

This is the reference's enc_features / dec_features path (reference:
src/generate_qtz_features.py:49-91) as a proper API:

  encode():  normalised features -> closed-loop predictor + fused
             scalar/VQ quantisation -> coded cepstra, codebook index
             streams, usage counts, and LPCNet-layout feature windows
             (un-normalised, with LPC recomputed from the CODED
             cepstra - that is the codec's defining trick).
  decode():  indicator bits + codebook indices (+ decoded pitch) ->
             identical coded feature track, via the closed-loop
             decoder.  encode->decode is exactly reconstructing
             (tested bit-for-bit at the float32 level).

Everything device-resident; the per-frame GPU->CPU->GPU + np.load
round-trips of the reference (wavernn.py:219-242, vq_func.py:141) are
gone.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from fpsc_tpu.dsp import constants as C
from fpsc_tpu.dsp.ceps2lpc import ceps2lpc
from fpsc_tpu.models import frame_predictor as fp
from fpsc_tpu.quant.scalar import scl_dequantize
from fpsc_tpu.quant.vq import vq_dequantize


def encode(params: fp.FramePredictorParams, codebooks: fp.Codebooks,
           feat: jax.Array, l1: float = 0.09, l2: float = 0.28,
           use_mask: bool = False, scale: float = 1000.0,
           pitch_lag: int = 0, send=None) -> Dict:
    """feat: (B, L, 20) normalised [ceps|pitch] frames.

    Returns dict with coded (B, L, 20) normalised coded frames,
    ind1/ind2 (B, L) bool, indices (index streams, -1 = unused),
    counts (per-codebook usage).  pitch_lag=1 selects the
    reference-checkpoint pitch convention (frame_predictor._lag_pitch)
    so imported .pth predictors run in-distribution.  send (threshold
    path only): frame-decimation pattern — see frame_predictor.encoder.
    """
    if use_mask:
        assert send is None, "decimation rides the threshold path"
        out = fp.mask_enc(params, feat, scale=scale,
                          codebooks=codebooks, qtz=True,
                          pitch_lag=pitch_lag)
        # stays traced: no host round trip, so the mask path fuses
        # under jit exactly like the threshold path
        ind1 = out["scl_mask"][..., 0] > 0.5
        ind2 = out["vct_mask"][..., 0] > 0.5
        r_qtz, r = out["r"], out["r_orig"]   # mask_enc's key layout
    else:
        out = fp.encoder(params, feat, l1=l1, l2=l2,
                         codebooks=codebooks, qtz=True,
                         pitch_lag=pitch_lag, send=send)
        ind1, ind2 = out["ind1"], out["ind2"]
        r_qtz, r = out["r_qtz"], out["r"]
    counts = fp.usage_counts(codebooks, out["indices"])
    return {"coded": out["c_in"], "r_qtz": r_qtz,
            "r": r, "ind1": ind1, "ind2": ind2,
            "indices": out["indices"], "counts": counts}


def dequantize_residual(codebooks: fp.Codebooks, ind1: jax.Array,
                        ind2: jax.Array, indices: Dict) -> jax.Array:
    """Transmitted index streams -> (B, L, 18) dequantised residuals
    (the per-frame above/below-threshold codebook selection of
    reference wavernn.py:213-239, batched)."""
    def safe(idx):
        return jnp.maximum(idx, 0)

    r0_above = scl_dequantize(safe(indices["scl"]), codebooks.scl)
    if codebooks.scl_bl is not None:
        r0_below = scl_dequantize(safe(indices["scl_bl"]), codebooks.scl_bl)
    else:
        r0_below = jnp.zeros_like(r0_above)
    r0 = jnp.where(ind1, r0_above, r0_below)

    rv_above = vq_dequantize(safe(indices["vq"]), codebooks.vq)
    if codebooks.vq_bl is not None:
        rv_below = vq_dequantize(safe(indices["vq_bl"]), codebooks.vq_bl)
    else:
        rv_below = jnp.zeros_like(rv_above)
    rv = jnp.where(ind2[..., None], rv_above, rv_below)

    return jnp.concatenate([r0[..., None], rv], axis=-1)


def decode(params: fp.FramePredictorParams, codebooks: fp.Codebooks,
           ind1: jax.Array, ind2: jax.Array, indices: Dict,
           pitch: jax.Array, pitch_lag: int = 0) -> jax.Array:
    """Reconstruct coded frames from transmitted data only.

    ind1/ind2: (B, L) bools; indices: encoder index streams;
    pitch: (B, L, 2) pitch features (coded separately upstream).
    Returns (B, L, 20) normalised coded frames == encode()['coded'].
    """
    r_qtz = dequantize_residual(codebooks, ind1, ind2, indices)
    return fp.decoder(params, pitch, r_qtz, pitch_lag=pitch_lag)


def coded_feature_windows(coded: jax.Array) -> np.ndarray:
    """(B, L, 20) normalised coded frames -> list of (n_chunks, 19, 36)
    LPCNet-layout windows with LPC recomputed from the CODED cepstra
    (reference generate_qtz_features.py:61-71).

    L must be n_chunks*15 + 4 context rows already included, or a plain
    n_chunks*15 track (then context rows are edge-replicated).
    """
    coded = np.asarray(coded) * C.MAXI
    b, length, _ = coded.shape
    flat = coded.reshape(-1, coded.shape[-1])
    _, lpc, _ = ceps2lpc(jnp.asarray(flat[:, :C.NB_BANDS]))
    rows = np.concatenate([flat, np.asarray(lpc)], axis=1).reshape(
        b, length, C.NB_FEATURES)

    out = []
    from fpsc_tpu.data.f32 import repack_windows
    for i in range(b):
        track = rows[i]
        if (length - 2 * C.CONTEXT_FRAMES) % C.FRAMES_PER_CHUNK == 0 and \
                length % C.FRAMES_PER_CHUNK != 0:
            n_chunks = (length - 2 * C.CONTEXT_FRAMES) // C.FRAMES_PER_CHUNK
        else:
            n_chunks = length // C.FRAMES_PER_CHUNK
            pad = np.concatenate([
                np.repeat(track[:1], C.CONTEXT_FRAMES, axis=0), track,
                np.repeat(track[-1:], C.CONTEXT_FRAMES, axis=0)], axis=0)
            track = pad
        out.append(repack_windows(track, n_chunks))
    return out
