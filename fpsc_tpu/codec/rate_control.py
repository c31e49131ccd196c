"""Rate control: measured R-D operating points and target-bitrate
presets.

The reference ships ONE operating point (l1=0.09, l2=0.28 —
README.md:24-27, the paper's ~2 kb/s configuration) and offers no way
to hit a different rate.  Measured at the trained flagship point, the
thresholds alone are a WEAK rate knob (scaling them 0.5x-3.5x moves
the entropy-coded rate only 1368-1442 b/s: most frames already sit
below threshold and the always-on streams — below-threshold VQ,
gains, pitch — dominate the budget).  Real rate authority comes from
the CODEBOOK-SUBSET presets, all decodable from the same trained
artifacts with no retraining:

* preset_codebooks() derives reduced codebooks (drop the 2nd
  above-threshold VQ stage and/or the whole below-threshold VQ —
  the ~440 b/s dominant stream); the closed-loop encoder re-tracks
  the coarser reconstruction, and every pack/unpack layer already
  parameterises by the `sizes` dict, so the preset id is all a
  decoder needs.
* measure_operating_points() encodes a calibration batch at a grid of
  threshold SCALES for one codebook set, entropy-packs every
  utterance with the REAL coder (shared priors collected per point,
  as deployed), returning measured (scale, b/s, coded-feature MSE)
  points — header/flush costs and model adaptation included, not an
  entropy estimate.  With the below-threshold VQ dropped the
  threshold knob regains authority (it sets the fraction of frames
  riding the expensive fine path).
* measure_rd_surface() sweeps presets x scales; pareto_frontier()
  keeps the non-dominated points; select_preset() picks the
  best-quality frontier point within a target bitrate.  select_scale()
  still interpolates within a single preset's monotone curve.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fpsc_tpu.codec import bitstream as bs
from fpsc_tpu.codec import native_rc
from fpsc_tpu.codec.codec import encode
from fpsc_tpu.dsp import constants as C
from fpsc_tpu.models import frame_predictor as fp


def _rc():
    # byte-identical native C++ entropy backend when it builds (parity
    # pinned in tests/test_native_rc.py), pure-Python reference
    # otherwise.  Resolved lazily at first USE: best() may g++-compile
    # the library, which must not run as an import side effect (two
    # importing processes would race on librangecoder.so; the build
    # itself is additionally file-locked in native_rc._build_lib).
    return native_rc.best()

# codebook-subset presets, richest first.  vq_stages = above-threshold
# VQ stages kept; vq_bl = keep the below-threshold VQ stream.
PRESETS: Dict[str, Dict] = {
    "full":   {"vq_stages": None, "vq_bl": True},
    "vq1":    {"vq_stages": 1,    "vq_bl": True},
    "novqbl": {"vq_stages": None, "vq_bl": False},
    "lean":   {"vq_stages": 1,    "vq_bl": False},
}


def preset_codebooks(codebooks: fp.Codebooks, vq_stages=None,
                     vq_bl: bool = True) -> fp.Codebooks:
    """Derive a reduced codebook set from the trained artifacts.

    The scalar gains are always kept (they carry the envelope); only
    vector stages are dropped.  The result plugs into encode/decode/
    pack/unpack unchanged — the bitstream layout follows the sizes
    dict derived from whatever books are present."""
    vq = codebooks.vq if vq_stages is None else codebooks.vq[:vq_stages]
    return fp.Codebooks(
        scl=codebooks.scl, vq=tuple(vq), scl_bl=codebooks.scl_bl,
        vq_bl=codebooks.vq_bl if vq_bl else None)


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
                             normalized: bool = True,
                             preset: str = "full",
                             use_mask: bool = False,
                             mask_scale: float = 1000.0) -> List[Dict]:
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
    rc = _rc()
    orders = rc.scalar_orders(codebooks)
    # use_mask: indicators come from the trained mask head
    # (the reference's deployed encoder) — the threshold scale is
    # inert, so callers sweep presets only (scales=(1.0,))
    enc_jit = jax.jit(
        lambda p, c, f, a, b: encode(p, c, f, l1=a, l2=b,
                                     use_mask=use_mask,
                                     scale=mask_scale))
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
        points.append({"preset": preset, "scale": float(s),
                       "l1": l1 * s, "l2": l2 * s,
                       "bps": bits / frames * 100.0, "mse": mse,
                       "priors": priors, "orders": orders,
                       "sizes": sizes})
    return points


def measure_rd_surface(params, codebooks, feat,
                       presets: Dict[str, Dict] = PRESETS,
                       scales: Sequence[float] = (
                           0.35, 0.5, 0.75, 1.0, 1.5, 2.25),
                       l1: float = 0.09, l2: float = 0.28,
                       normalized: bool = True,
                       use_mask: bool = False,
                       mask_scale: float = 1000.0) -> List[Dict]:
    """Sweep presets x threshold scales on a calibration batch.

    Sub-1 scales are included deliberately: once the below-threshold
    VQ is dropped, LOWERING the thresholds routes more frames through
    the fine above-threshold path, so the scale knob spans real rate
    within each reduced preset.  With use_mask the indicator streams
    come from the trained mask head and the scale knob is inert, so
    the sweep collapses to presets only.  Returns the flat point list
    (each point carries its preset name + sizes dict + priors)."""
    if use_mask:
        scales = (1.0,)
    points = []
    for name, spec in presets.items():
        cbs = preset_codebooks(codebooks, **spec)
        points.extend(measure_operating_points(
            params, cbs, feat, scales=scales, l1=l1, l2=l2,
            normalized=normalized, preset=name, use_mask=use_mask,
            mask_scale=mask_scale))
    return points


def pareto_frontier(points: List[Dict]) -> List[Dict]:
    """Non-dominated subset (no other point has <= bps AND <= mse
    with one strict), sorted by ascending bps."""
    pts = sorted(points, key=lambda p: (p["bps"], p["mse"]))
    out: List[Dict] = []
    best_mse = np.inf
    for p in pts:
        if p["mse"] < best_mse - 1e-12:
            out.append(p)
            best_mse = p["mse"]
    return out


def select_preset(points: List[Dict], target_bps: float) -> Dict:
    """Best-quality frontier point whose measured rate fits within
    target_bps; below the measured range, the lowest-rate point.
    The returned dict is a deployable operating point: preset name,
    thresholds, sizes, and the calibration priors."""
    front = pareto_frontier(points)
    fits = [p for p in front if p["bps"] <= target_bps]
    return fits[-1] if fits else front[0]


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
