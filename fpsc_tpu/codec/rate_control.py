"""Rate control: threshold operating points and target-bitrate
selection.

The reference ships ONE operating point (l1=0.09, l2=0.28 —
README.md:24-27, the paper's ~2 kb/s configuration); the thresholds
that split the prediction residual into coded/skipped streams ARE the
codec's rate knob, but the reference offers no way to pick them for a
target rate.  Here:

* measure_operating_points() encodes a calibration batch at a grid of
  threshold SCALES (l1, l2 scaled together — raising both transmits
  fewer frames), entropy-packs every utterance (shared priors
  collected per point, as deployed), and returns the measured
  (scale, b/s, coded-feature MSE) rate-distortion curve.
* select_scale() log-interpolates the monotone rate curve to hit a
  target bitrate, returning the (l1, l2) to deploy.  Each deployed
  point ships its own priors dict, exactly like the codebooks.

Rates are measured with the REAL packer (range coder incl. pitch), so
per-utterance header/flush costs and model adaptation are included —
not an entropy estimate.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fpsc_tpu.codec import bitstream as bs
from fpsc_tpu.codec import range_coder as rc
from fpsc_tpu.codec.codec import encode
from fpsc_tpu.dsp import constants as C


def _streams_for(enc: Dict, feat: np.ndarray, pitch_scale: float):
    """Per-utterance (ind1, ind2, indices, pcodes) 4-tuples from a
    batched encode() output."""
    out = []
    ind1 = np.asarray(enc["ind1"])
    ind2 = np.asarray(enc["ind2"])
    idx = {k: np.asarray(v) for k, v in enc["indices"].items()}
    for b in range(ind1.shape[0]):
        pcodes = bs.quantize_pitch(feat[b, :, 18:] * pitch_scale)
        out.append((ind1[b], ind2[b],
                    {k: v[b] for k, v in idx.items()}, pcodes))
    return out


def measure_operating_points(params, codebooks, feat,
                             scales: Sequence[float] = (
                                 0.5, 0.75, 1.0, 1.5, 2.25, 3.5),
                             l1: float = 0.09, l2: float = 0.28,
                             normalized: bool = True) -> List[Dict]:
    """feat: (B, L, 36-or-20) calibration frames (normalised when
    `normalized`).  Returns one dict per scale: {scale, l1, l2, bps,
    mse, priors, orders} with bps = mean entropy-coded rate over the
    batch (shared priors collected from the same batch — in-sample,
    like the artifacts each preset would ship) and mse = coded-feature
    MSE over the 18 cepstral dims."""
    feat = jnp.asarray(feat)
    pitch_scale = C.MAXI if normalized else 1.0
    sizes = {
        "scl": int(codebooks.scl.shape[0]),
        "scl_bl": int(codebooks.scl_bl.shape[0])
        if codebooks.scl_bl is not None else 0,
        "vq": [int(cb.shape[0]) for cb in codebooks.vq],
        "vq_bl": [int(cb.shape[0]) for cb in codebooks.vq_bl]
        if codebooks.vq_bl is not None else [],
    }
    orders = rc.scalar_orders(codebooks)
    enc_jit = jax.jit(
        lambda p, c, f, a, b: encode(p, c, f, l1=a, l2=b),
        static_argnums=())
    points = []
    feat_np = np.asarray(feat)
    for s in scales:
        enc = enc_jit(params, codebooks, feat,
                      jnp.float32(l1 * s), jnp.float32(l2 * s))
        streams = _streams_for(enc, feat_np, pitch_scale)
        priors = rc.collect_priors(streams, sizes, orders=orders)
        bits = frames = 0
        for i1, i2, ix, pc in streams:
            payload = rc.pack_utterance_rc(i1, i2, ix, pc, sizes,
                                           priors=priors,
                                           orders=orders)
            bits += len(payload) * 8
            frames += len(i1)
        coded = np.asarray(enc["coded"])
        mse = float(np.mean(
            (coded[..., :18] - feat_np[..., :18]) ** 2))
        points.append({"scale": float(s), "l1": l1 * s, "l2": l2 * s,
                       "bps": bits / frames * 100.0, "mse": mse,
                       "priors": priors, "orders": orders})
    return points


def select_scale(points: List[Dict], target_bps: float) -> Dict:
    """Pick/interpolate the threshold scale whose measured rate is
    closest to target_bps (log-linear interpolation on the monotone
    rate-vs-scale curve; clamps at the measured ends).  Returns
    {scale, l1, l2, bps_est} — re-encode at the returned thresholds
    (and collect fresh priors) to deploy the preset."""
    pts = sorted(points, key=lambda p: p["bps"])
    if target_bps <= pts[0]["bps"]:
        p = pts[0]
        return {"scale": p["scale"], "l1": p["l1"], "l2": p["l2"],
                "bps_est": p["bps"]}
    if target_bps >= pts[-1]["bps"]:
        p = pts[-1]
        return {"scale": p["scale"], "l1": p["l1"], "l2": p["l2"],
                "bps_est": p["bps"]}
    for lo, hi in zip(pts, pts[1:]):
        if lo["bps"] <= target_bps <= hi["bps"]:
            t = (np.log(target_bps) - np.log(lo["bps"])) / (
                np.log(hi["bps"]) - np.log(lo["bps"]))
            s = float(np.exp((1 - t) * np.log(lo["scale"])
                             + t * np.log(hi["scale"])))
            ratio = lo["l1"] / lo["scale"], lo["l2"] / lo["scale"]
            return {"scale": s, "l1": ratio[0] * s, "l2": ratio[1] * s,
                    "bps_est": float(target_bps)}
    raise AssertionError("unreachable")
