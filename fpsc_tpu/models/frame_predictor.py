"""Frame-rate feature predictor ("Wavernn" in the reference).

Capability parity with reference src/models/wavernn.py:22-379:

* `forward`     - full-sequence teacher-forced prediction
                  (wavernn.py:63-102): GRU(20->G1) -> GRU(G1->G2) ->
                  ReLU -> 2*tanh(Linear(G2->18)).  (The reference's
                  "dual_fc" applies ONE shared Linear+Tanh to two copies
                  of the input and sums them, which is exactly
                  2*tanh(Wx+b).)
* `encoder`     - closed-loop threshold-split encode with fused
                  scalar + m-best VQ (wavernn.py:165-256), as a single
                  lax.scan: no per-frame host round-trips, no per-call
                  codebook reloads.
* `mask_forward`/`mask_enc` - learned-mask variant (wavernn.py:259-310)
                  with the bidirectional mask GRU implemented for real
                  (the reference's mask_rnn layers are commented out at
                  wavernn.py:54-58; we implement the intended design).
* `decoder`     - closed-loop decode from residuals (fixes the
                  uninitialised-state/tuple-index bugs of
                  wavernn.py:367-379; intended behaviour implemented).

TPU-native design: the whole closed-loop runs as one scan carrying
(h1, h2, previous coded frame); quantisation happens inside the scan
with codebooks resident on-device.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from fpsc_tpu.models.common import DenseParams, dense, init_dense
from fpsc_tpu.models.gru import (GRUParams, bigru_scan, gru_scan, gru_step,
                                 init_gru)

NB_CEPS = 18


@dataclass(frozen=True)
class FramePredictorConfig:
    in_features: int = 20
    gru_units1: int = 384
    gru_units2: int = 128
    fc_units: int = NB_CEPS
    mask_units: int = 18


class FramePredictorParams(NamedTuple):
    rnn1: GRUParams
    rnn2: GRUParams
    fc: DenseParams
    mask_fwd: GRUParams
    mask_bwd: GRUParams
    mask_fc: DenseParams


class Codebooks(NamedTuple):
    """On-device codebook set for the threshold / mask codec.

    scl:    (K,) scalar centers for c0, above threshold
    vq:     tuple of (E_s, 17) stage books for c1..c17, above threshold
    scl_bl: optional (K_bl,) below-threshold scalar centers
    vq_bl:  optional tuple of below-threshold stage books
    """
    scl: jax.Array
    vq: Tuple[jax.Array, ...]
    scl_bl: Optional[jax.Array] = None
    vq_bl: Optional[Tuple[jax.Array, ...]] = None


def init_frame_predictor(key: jax.Array,
                         cfg: FramePredictorConfig = FramePredictorConfig()
                         ) -> FramePredictorParams:
    keys = jax.random.split(key, 6)
    return FramePredictorParams(
        rnn1=init_gru(keys[0], cfg.in_features, cfg.gru_units1),
        rnn2=init_gru(keys[1], cfg.gru_units1, cfg.gru_units2),
        fc=init_dense(keys[2], cfg.gru_units2, cfg.fc_units),
        mask_fwd=init_gru(keys[3], cfg.in_features, cfg.mask_units),
        mask_bwd=init_gru(keys[4], cfg.in_features, cfg.mask_units),
        mask_fc=init_dense(keys[5], 2 * cfg.mask_units, 2),
    )


def _head(params: FramePredictorParams, h2: jax.Array) -> jax.Array:
    """ReLU -> summed dual FC == 2*tanh(dense)."""
    return 2.0 * jnp.tanh(dense(params.fc, jax.nn.relu(h2)))


def forward(params: FramePredictorParams, x: jax.Array,
            h1: Optional[jax.Array] = None,
            h2: Optional[jax.Array] = None):
    """Teacher-forced full-sequence pass.

    x: (B, L, 20) -> (out (B, L, 18), h1, h2); out[:, t] predicts
    frame t+1 (reference trains with MSE(out[:, :-1], feat[:, 1:])).
    """
    y1, h1 = gru_scan(params.rnn1, x, h1)
    y2, h2 = gru_scan(params.rnn2, y1, h2)
    return _head(params, y2), h1, h2


def step(params: FramePredictorParams, h1: jax.Array, h2: jax.Array,
         x: jax.Array):
    """Single-frame step for closed-loop scans. x: (B, 20)."""
    h1 = gru_step(params.rnn1, h1, x)
    h2 = gru_step(params.rnn2, h2, h1)
    return _head(params, h2), h1, h2


def mask_forward(params: FramePredictorParams, feat: jax.Array,
                 scale: jax.Array) -> jax.Array:
    """Learned keep-masks: (B, L, 2) in (0, 1).

    Bidirectional mask GRU -> Linear(2*units -> 2) -> tanh -> sigmoid
    of (mask * scale); scale anneals toward a hard 0/1 gate
    (reference wavernn.py:263-266 with model.scale annealed by
    train_frame.py:63-64).
    """
    y = bigru_scan(params.mask_fwd, params.mask_bwd, feat)
    m = jnp.tanh(dense(params.mask_fc, y))
    return jax.nn.sigmoid(m * scale)


# --------------------------------------------------------------------------
# In-scan quantisation helpers
# --------------------------------------------------------------------------

def _scl_nearest(codes: jax.Array, x: jax.Array):
    """x: (B,) -> (quantised (B,), index (B,)). Ties -> lowest index."""
    d = jnp.square(x[:, None] - codes[None, :])
    idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    return codes[idx], idx


def _vq_mbest_batch(books: Sequence[jax.Array], x: jax.Array):
    """x: (B, 17) -> (quantised (B, 17), indices (B, n_stages))."""
    from fpsc_tpu.quant.vq import mbest_search
    qx, idx = jax.vmap(lambda v: mbest_search(v, books))(x)
    return qx, idx


def _quantize_residual(cbs: Codebooks, r_s: jax.Array,
                       ind1: jax.Array, ind2: jax.Array):
    """Quantise one frame's residuals under the above/below split.

    r_s: (B, 18); ind1/ind2: (B,) bool.  Returns (r_qtz (B, 18),
    idx dict of index arrays with -1 where a codebook was not used).
    """
    b = r_s.shape[0]
    q_above, i_above = _scl_nearest(cbs.scl, r_s[:, 0])
    if cbs.scl_bl is not None:
        q_bl, i_bl = _scl_nearest(cbs.scl_bl, r_s[:, 0])
        r0 = jnp.where(ind1, q_above, q_bl)
        i_scl_bl = jnp.where(ind1, -1, i_bl)
    else:
        r0 = jnp.where(ind1, q_above, 0.0)
        i_scl_bl = jnp.full((b,), -1, jnp.int32)
    i_scl = jnp.where(ind1, i_above, -1)

    qv_above, iv_above = _vq_mbest_batch(cbs.vq, r_s[:, 1:])
    if cbs.vq_bl is not None:
        qv_bl, iv_bl = _vq_mbest_batch(cbs.vq_bl, r_s[:, 1:])
        rv = jnp.where(ind2[:, None], qv_above, qv_bl)
        i_vq_bl = jnp.where(ind2[:, None], -1, iv_bl)
    else:
        rv = jnp.where(ind2[:, None], qv_above, 0.0)
        i_vq_bl = jnp.full((b, 1), -1, jnp.int32)
    i_vq = jnp.where(ind2[:, None], iv_above, -1)

    r_qtz = jnp.concatenate([r0[:, None], rv], axis=1)
    indices = {"scl": i_scl, "scl_bl": i_scl_bl,
               "vq": i_vq, "vq_bl": i_vq_bl}
    return r_qtz, indices


def usage_counts(cbs: Codebooks, indices) -> list:
    """Aggregate per-codebook usage histograms from encoder index
    streams (entries marked -1 are 'codebook not used')."""
    out = []

    def hist(idx, size):
        idx = idx.reshape(-1)
        valid = idx >= 0
        return (jnp.zeros((size,), jnp.int32)
                .at[jnp.where(valid, idx, 0)]
                .add(valid.astype(jnp.int32)))

    out.append(hist(indices["scl"], cbs.scl.shape[0]))
    if cbs.scl_bl is not None:
        out.append(hist(indices["scl_bl"], cbs.scl_bl.shape[0]))
    for s, cb in enumerate(cbs.vq):
        out.append(hist(indices["vq"][..., s], cb.shape[0]))
    if cbs.vq_bl is not None:
        for s, cb in enumerate(cbs.vq_bl):
            out.append(hist(indices["vq_bl"][..., s], cb.shape[0]))
    return out


# --------------------------------------------------------------------------
# Closed-loop codec passes
# --------------------------------------------------------------------------

def _lag_pitch(pitch: jax.Array, pitch_lag: int) -> jax.Array:
    """Shift the pitch CONDITIONING track right by pitch_lag frames
    (zeros enter at t=0).

    pitch_lag=1 is the reference-checkpoint compat mode: the reference
    threshold encoder conditions frame t on the pitch of t-1 with a
    zero-pitch step 0 (wavernn.py:177-180, c_in[:,1:,-2:]=feat[:,:,-2:])
    — a .pth imported via utils/torch_import.py only runs
    in-distribution under this convention.  Our native convention
    (pitch_lag=0, current-frame pitch) remains the default; only the
    scan INPUT is lagged — returned coded frames always carry the
    unshifted pitch, exactly like the reference's returned c_in[:,1:].
    """
    if not pitch_lag:
        return pitch
    return jnp.concatenate(
        [jnp.zeros_like(pitch[:, :pitch_lag]), pitch[:, :-pitch_lag]],
        axis=1)


def encoder(params: FramePredictorParams, feat: jax.Array,
            l1: float, l2: float,
            codebooks: Optional[Codebooks] = None,
            mask: Optional[jax.Array] = None,
            qtz: bool = True, pitch_lag: int = 0,
            send: Optional[jax.Array] = None):
    """Closed-loop threshold-split encode as one lax.scan.

    feat: (B, L, 20) normalised [ceps(18) | pitch(2)] frames.
    mask: optional (B, L, 2) external indicators overriding the
    thresholds (reference's `mask` argument).
    pitch_lag: 1 = reference-checkpoint pitch convention (_lag_pitch).
    send: optional (L,) or (B, L) bool — frame-decimation pattern for
    the sub-800 b/s presets.  On send=False frames NOTHING is
    transmitted: the encoder quantises no residual (indices -1,
    indicators False), holds the pitch conditioning, and feeds back
    its own prediction — byte-for-byte what a receiver running
    plc.conceal_decode(lost=~send, damp=1, energy_cap=False,
    fade_step=0) reconstructs, so the closed loop stays consistent
    end to end (pinned in tests/test_rate_control.py).

    Returns dict with:
      c_in   (B, L, 20): coded frames (prediction + kept residual,
                          pitch passed through)  [wavernn.py:242,252]
      r      (B, L, 18): raw (qtz) or indicator-masked (not qtz) residual
      r_qtz  (B, L, 18): quantised residual (zeros when qtz=False)
      r_under(B, L, 18): below-threshold residual (qtz=False path)
      ind1/ind2 (B, L):  indicator streams
      indices:           per-frame codebook index streams (qtz=True)
    """
    b, length, _ = feat.shape
    ceps, pitch = feat[..., :NB_CEPS], feat[..., NB_CEPS:]
    assert send is None or qtz, "decimation needs the quantised path"

    h1 = jnp.zeros((b, params.rnn1.units), feat.dtype)
    h2 = jnp.zeros((b, params.rnn2.units), feat.dtype)
    prev = jnp.zeros((b, NB_CEPS), feat.dtype)

    xs = {"ceps": jnp.swapaxes(ceps, 0, 1),
          "pitch": jnp.swapaxes(_lag_pitch(pitch, pitch_lag), 0, 1)}
    if mask is not None:
        xs["mask"] = jnp.swapaxes(mask, 0, 1)
    if send is not None:
        xs["send"] = jnp.swapaxes(
            jnp.broadcast_to(jnp.asarray(send, bool), (b, length)), 0, 1)

    def scan_step(carry, x):
        if send is not None:
            h1, h2, prev, prev_pitch = carry
            pit = jnp.where(x["send"][:, None], x["pitch"], prev_pitch)
        else:
            h1, h2, prev = carry
            pit = x["pitch"]
        inp = jnp.concatenate([prev, pit], axis=-1)
        f_out, h1, h2 = step(params, h1, h2, inp)
        r_s = x["ceps"] - f_out

        if mask is None:
            ind1 = jnp.abs(r_s[:, 0]) > l1
            ind2 = jnp.sum(jnp.abs(r_s[:, 1:]), axis=-1) > l2
        else:
            ind1 = x["mask"][:, 0] > 0.5
            ind2 = x["mask"][:, 1] > 0.5
        if send is not None:
            ind1 = ind1 & x["send"]
            ind2 = ind2 & x["send"]

        if qtz:
            r_qtz, indices = _quantize_residual(codebooks, r_s, ind1, ind2)
            if send is not None:
                snd = x["send"]
                r_qtz = r_qtz * snd[:, None].astype(r_qtz.dtype)
                indices = {
                    k: jnp.where(snd[:, None] if v.ndim == 2
                                 else snd, v, -1)
                    for k, v in indices.items()}
            prev = f_out + r_qtz
            out = {"c_in": prev, "r": r_s, "r_qtz": r_qtz,
                   "r_under": jnp.zeros_like(r_s),
                   "ind1": ind1, "ind2": ind2, "indices": indices}
        else:
            keep = jnp.concatenate(
                [ind1[:, None], jnp.repeat(ind2[:, None], NB_CEPS - 1,
                                           axis=1)], axis=1)
            r_keep = r_s * keep
            prev = f_out + r_keep
            out = {"c_in": prev, "r": r_keep,
                   "r_qtz": jnp.zeros_like(r_s),
                   "r_under": r_s * (1.0 - keep),
                   "ind1": ind1, "ind2": ind2}
        if send is not None:
            return (h1, h2, prev, pit), out
        return (h1, h2, prev), out

    carry0 = (h1, h2, prev) if send is None else (
        h1, h2, prev, jnp.zeros((b, pitch.shape[-1]), feat.dtype))
    _, ys = jax.lax.scan(scan_step, carry0, xs)
    out = jax.tree_util.tree_map(lambda a: jnp.swapaxes(a, 0, 1), ys)
    out["c_in"] = jnp.concatenate([out["c_in"], pitch], axis=-1)
    return out


def mask_enc(params: FramePredictorParams, feat: jax.Array,
             scale: jax.Array = 1.0,
             codebooks: Optional[Codebooks] = None,
             qtz: bool = False, pitch_lag: int = 0):
    """Learned-mask closed-loop pass (reference wavernn.py:259-310).

    qtz=False (training / residual synthesis): residuals are soft-kept
    by multiplying with the sigmoid masks; differentiable end-to-end.
    qtz=True (deployment): masks harden to indicators (> 0.5) and the
    kept residuals are quantised in-scan.

    Returns dict with c_in, r_orig, r, r_bl, scl_mask, vct_mask
    (+ indices when qtz=True).
    """
    b, length, _ = feat.shape
    ceps, pitch = feat[..., :NB_CEPS], feat[..., NB_CEPS:]
    masks = mask_forward(params, feat, scale)  # (B, L, 2)

    h1 = jnp.zeros((b, params.rnn1.units), feat.dtype)
    h2 = jnp.zeros((b, params.rnn2.units), feat.dtype)
    prev = jnp.zeros((b, NB_CEPS), feat.dtype)

    xs = {"ceps": jnp.swapaxes(ceps, 0, 1),
          "pitch": jnp.swapaxes(_lag_pitch(pitch, pitch_lag), 0, 1),
          "mask": jnp.swapaxes(masks, 0, 1)}

    def scan_step(carry, x):
        h1, h2, prev = carry
        inp = jnp.concatenate([prev, x["pitch"]], axis=-1)
        f_out, h1, h2 = step(params, h1, h2, inp)
        r_s = x["ceps"] - f_out
        scl_m = x["mask"][:, 0:1]
        vct_m = x["mask"][:, 1:2]

        if qtz:
            ind1 = scl_m[:, 0] > 0.5
            ind2 = vct_m[:, 0] > 0.5
            r_mask, indices = _quantize_residual(codebooks, r_s, ind1, ind2)
            r_bl = jnp.zeros_like(r_s)
            extra = {"indices": indices}
        else:
            r_mask = jnp.concatenate(
                [r_s[:, 0:1] * scl_m, r_s[:, 1:] * vct_m], axis=1)
            r_bl = jnp.concatenate(
                [r_s[:, 0:1] * (1 - scl_m), r_s[:, 1:] * (1 - vct_m)],
                axis=1)
            extra = {}
        prev = f_out + r_mask
        out = {"c_in": prev, "r_orig": r_s, "r": r_mask, "r_bl": r_bl}
        out.update(extra)
        return (h1, h2, prev), out

    _, ys = jax.lax.scan(scan_step, (h1, h2, prev), xs)
    out = jax.tree_util.tree_map(lambda a: jnp.swapaxes(a, 0, 1), ys)
    out["c_in"] = jnp.concatenate([out["c_in"], pitch], axis=-1)
    out["scl_mask"] = masks[..., 0:1]
    out["vct_mask"] = masks[..., 1:2]
    return out


def decoder(params: FramePredictorParams, pitch: jax.Array,
            r: jax.Array, pitch_lag: int = 0) -> jax.Array:
    """Closed-loop decode: reconstruct coded frames from residuals.

    pitch: (B, L, 2) decoded pitch track; r: (B, L, 18) dequantised
    residuals.  Returns coded frames (B, L, 20).  This is the intended
    behaviour of reference wavernn.py:367-379 (which crashes on
    uninitialised h1/h2); by construction decoder(pitch, r_qtz)[..., :18]
    == encoder(...)['c_in'][..., :18].  pitch_lag must match the
    encoder's (1 = reference-checkpoint convention, _lag_pitch).
    """
    b, length, _ = pitch.shape
    h1 = jnp.zeros((b, params.rnn1.units), r.dtype)
    h2 = jnp.zeros((b, params.rnn2.units), r.dtype)
    prev = jnp.zeros((b, NB_CEPS), r.dtype)

    xs = {"pitch": jnp.swapaxes(_lag_pitch(pitch, pitch_lag), 0, 1),
          "r": jnp.swapaxes(r, 0, 1)}

    def scan_step(carry, x):
        h1, h2, prev = carry
        inp = jnp.concatenate([prev, x["pitch"]], axis=-1)
        f_out, h1, h2 = step(params, h1, h2, inp)
        prev = f_out + x["r"]
        return (h1, h2, prev), prev

    _, ys = jax.lax.scan(scan_step, (h1, h2, prev), xs)
    coded = jnp.swapaxes(ys, 0, 1)
    return jnp.concatenate([coded, pitch], axis=-1)
