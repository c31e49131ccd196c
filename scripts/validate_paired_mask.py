"""PAIRED, rate-matched mask-vs-threshold comparison (VERDICT r4
next #6).

Round 4 compared the mask flagship (0.524 LSD @ 1959 b/s) against the
threshold flagship (0.542 @ 1227) across DIFFERENT artifact
generations, with per-arm vocoders, at unmatched rates — the 0.018
LSD delta sat inside the ±0.02 retrain noise and the round-4 frontier
point 0.522 @ 1377 dominated the mask row on both axes.  This script
settles it under a controlled pairing:

  * SAME corpus + SAME val split (the deterministic speech fixtures at
    the flagship config — identical utterances for both arms),
  * ONE shared production vocoder (the saved threshold flagship's
    bunched+sparse vocoder synthesises BOTH arms' decoded features:
    vocoder training variance, the dominant noise source, cancels),
  * SAME sampling noise (one PRNG key per utterance, both arms),
  * RATE-MATCHED operating points from each arm's measured R-D
    surface: the threshold codec evaluated at the mask codec's
    natural rate, and the mask codec at its own lowest reachable
    preset next to the threshold point of the same rate,
  * PAIRED per-utterance Bark-LSD and NSIM deltas (mean +/- std and
    sign counts), on decoded AUDIO.

Needs the saved threshold flagship artifacts (run validate_flagship
first); trains the mask arm's predictor + codebooks fresh on the same
corpus (~minutes — the vocoder, the expensive part, is shared).

    python scripts/validate_paired_mask.py [pred_epochs] [flag_label]

Reference anchor: the mask encoder is the reference's deployed
listening-test path (src/synthesis_qtz.py:93, wavernn.py:259-310);
the threshold path is its README operating point.
"""
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

OUT = "/tmp/fpsc_flagship"
OUT_P = "/tmp/fpsc_paired_mask"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from validate_rate_control import (codebook_path, newest_epoch,
                                   newest_label)


def main(pred_epochs: int = 400, flag_label: str = None):
    import jax
    import jax.numpy as jnp

    from fpsc_tpu.codec import bitstream as bs
    from fpsc_tpu.codec import range_coder as rc
    from fpsc_tpu.codec import rate_control as rcctl
    from fpsc_tpu.codec.codec import decode, encode
    from fpsc_tpu.config.config import Config, apply_overrides
    from fpsc_tpu.data.dataset import build_dataset, predictor_inputs
    from fpsc_tpu.dsp import constants as C
    from fpsc_tpu.dsp.ceps2lpc import ceps2lpc
    from fpsc_tpu.dsp.emphasis import deemphasis
    from fpsc_tpu.eval.metrics import log_spectral_distance
    from fpsc_tpu.eval.nsim import nsim
    from fpsc_tpu.models import lpcnet, lpcnet_bunched
    from fpsc_tpu.ops.lpcnet_sampler import (auto_block_pattern,
                                             pallas_generate)
    from fpsc_tpu.train import checkpoint as ckpt
    from fpsc_tpu.train import train_cb, train_frame
    from fpsc_tpu.train.train_frame import build_model

    data = [
        "data.synthetic=true", "data.synthetic_style=speech",
        "data.synthetic_utterances=96",
        "data.chunks=6", "data.batch_size=16",
    ]
    arch = ["predictor.gru_units1=384", "predictor.gru_units2=128"]

    # ---- threshold arm: the saved flagship artifacts ---------------
    label_t = flag_label or newest_label(OUT, "flag_")
    epoch_t = newest_epoch(OUT, label_t)
    print(f"threshold arm: {label_t} epoch {epoch_t}", flush=True)
    cfg_t = Config(label=label_t)
    apply_overrides(cfg_t, data + arch + [
        f"train.save_dir={OUT}",
        f"codec.codebook_path={codebook_path(OUT, label_t)}",
    ])
    params_t = build_model(cfg_t, jax.random.PRNGKey(cfg_t.train.seed))
    params_t = ckpt.restore_params(
        params_t, ckpt.load(ckpt.checkpoint_path(OUT, label_t,
                                                 epoch_t)),
        "threshold predictor")
    cbs_t = ckpt.load_codebooks(cfg_t.codec.codebook_path)

    # the SHARED production vocoder (bunched GRU_B-32, sparse-trained)
    voc_label = label_t + "_voc_s"
    voc_epoch = newest_epoch(OUT, voc_label)
    voc = lpcnet_bunched.init_bunched(
        jax.random.PRNGKey(2),
        lpcnet.LPCNetConfig(gru_b_units=32))
    voc = ckpt.restore_params(
        voc, ckpt.load(ckpt.checkpoint_path(OUT, voc_label,
                                            voc_epoch)),
        "shared vocoder")
    pat = auto_block_pattern(voc)
    print(f"shared vocoder: {voc_label} epoch {voc_epoch}", flush=True)

    # ---- mask arm: fresh predictor + codebooks, SAME corpus --------
    label_m = time.strftime("pmask_%m%d_%H%M%S")
    mask_over = data + arch + [
        f"train.epochs={pred_epochs}", "train.learning_rate=0.001",
        f"train.save_dir={OUT_P}", "train.save_every=50",
        "train.warmup_batches=1", "train.keep_rate=0.3",
        "codec.vq_entries=1024,1024", "codec.vq_entries_bl=512",
        "codec.scl_entries=256", "codec.scl_entries_bl=16",
        f"codec.codebook_path={OUT_P}/cb_{label_m}.npz",
        "codec.entropy_coding=true", "codec.use_mask=true",
    ]
    cfg_m = Config(label=label_m)
    apply_overrides(cfg_m, mask_over)
    print(f"=== train mask predictor ({pred_epochs} ep) ===", flush=True)
    t0 = time.time()
    _, min_loss = train_frame.run(cfg_m)
    print(f"mask predictor in {time.time()-t0:.0f}s, min val loss "
          f"{min_loss:.4f}", flush=True)
    cfg_mcb = Config(label=label_m)
    apply_overrides(cfg_mcb, mask_over + [
        f"train.transfer_model={label_m}",
        f"train.transfer_epoch={pred_epochs - 1}",
        "train.debugging=true"])
    train_cb.run(cfg_mcb)
    params_m = build_model(cfg_mcb, jax.random.PRNGKey(
        cfg_mcb.train.seed))
    params_m = ckpt.restore_params(
        params_m, ckpt.load(ckpt.checkpoint_path(
            OUT_P, label_m, pred_epochs - 1)), "mask predictor")
    cbs_m = ckpt.load_codebooks(cfg_mcb.codec.codebook_path)

    # ---- R-D surfaces on the SAME calibration batch ----------------
    ds_cal = build_dataset(cfg_t.data, "train")
    cal = next(ds_cal.iter_batches(16, seed=0))
    feat_cal = predictor_inputs(cal, cfg_t.data.normalize)
    print("=== R-D surfaces (calibration) ===", flush=True)
    pts_t = rcctl.measure_rd_surface(params_t, cbs_t, feat_cal,
                                     use_mask=False)
    pts_m = rcctl.measure_rd_surface(params_m, cbs_m, feat_cal,
                                     use_mask=True)

    def natural(points, preset="full", scale=1.0):
        for p in points:
            if p["preset"] == preset and abs(p["scale"] - scale) < 1e-9:
                return p
        raise KeyError(preset)

    nat_m = natural(pts_m)           # mask codec's deployed point
    nat_t = natural(pts_t)           # threshold reference point
    print(f"natural rates (cal): mask {nat_m['bps']:.0f} b/s, "
          f"threshold {nat_t['bps']:.0f} b/s", flush=True)
    # pair A: both arms near the MASK's natural rate
    pair_a = (rcctl.select_preset(pts_t, nat_m["bps"]), nat_m)
    # pair B: both arms near the THRESHOLD's natural rate (the mask
    # arm reaches down via its reduced presets; select_preset returns
    # its lowest point when none fits - the honest reachable floor)
    pair_b = (nat_t, rcctl.select_preset(pts_m, nat_t["bps"]))

    # ---- paired held-out evaluation ---------------------------------
    ds_val = build_dataset(cfg_t.data, "val")
    val = next(ds_val.iter_batches(8, seed=0))
    feat_val = jnp.asarray(predictor_inputs(val, cfg_t.data.normalize))
    n_utt = feat_val.shape[0]
    pitch_scale = C.MAXI if cfg_t.data.normalize else 1.0

    def run_arm(params, point, use_mask):
        cbs_full = cbs_m if use_mask else cbs_t
        cbs = rcctl.preset_codebooks(cbs_full,
                                     **rcctl.PRESETS[point["preset"]])
        enc = encode(params, cbs, feat_val, l1=point["l1"],
                     l2=point["l2"], use_mask=use_mask)
        ind1 = np.asarray(enc["ind1"])
        ind2 = np.asarray(enc["ind2"])
        idx = {k: np.asarray(v) for k, v in enc["indices"].items()}
        rates = []
        for b in range(n_utt):
            pcodes = bs.quantize_pitch(
                np.asarray(feat_val)[b, :, 18:] * pitch_scale)
            payload = rc.pack_utterance_rc(
                ind1[b], ind2[b], {k: v[b] for k, v in idx.items()},
                pcodes, point["sizes"], priors=point["priors"],
                orders=point["orders"])
            rates.append(bs.bitrate_bps(len(payload),
                                        feat_val.shape[1]))
        coded = decode(params, cbs, enc["ind1"], enc["ind2"],
                       enc["indices"], feat_val[:, :, 18:])
        coded_un = np.asarray(coded) * pitch_scale
        periods = (0.1 + 50.0 * coded_un[..., 18] + 100.0
                   ).astype(np.int32)
        _, lpc, _ = ceps2lpc(jnp.asarray(
            coded_un.reshape(-1, 20)[:, :18]))
        lpc = np.asarray(lpc).reshape(n_utt, -1, 16)
        # ONE key for both arms: paired sampling noise per utterance
        y = np.asarray(pallas_generate(
            voc, coded, jnp.asarray(periods), jnp.asarray(lpc),
            jax.random.PRNGKey(7),
            corr=jnp.asarray(coded_un[..., 19]), gru_a_pattern=pat))
        lsds, nsims = [], []
        for b in range(n_utt):
            truth = deemphasis(val["x"][b])
            yy = y[b][:len(truth)]
            lsds.append(log_spectral_distance(truth[:len(yy)], yy))
            nsims.append(nsim(truth[:len(yy)], yy))
        return (np.asarray(rates), np.asarray(lsds),
                np.asarray(nsims))

    print("=== paired held-out decoded-audio comparison ===",
          flush=True)
    verdicts = []
    for tag, (pt_t, pt_m) in (("A (mask-rate)", pair_a),
                              ("B (threshold-rate)", pair_b)):
        r_t, l_t, s_t = run_arm(params_t, pt_t, use_mask=False)
        r_m, l_m, s_m = run_arm(params_m, pt_m, use_mask=True)
        dl = l_m - l_t          # >0: mask WORSE (LSD lower = better)
        dn = s_m - s_t          # >0: mask BETTER (NSIM higher = better)
        print(f"pair {tag}:", flush=True)
        print(f"  threshold {pt_t['preset']:7s} scale "
              f"{pt_t['scale']:4.2f}: {r_t.mean():7.1f} b/s  "
              f"LSD {l_t.mean():.3f}  NSIM {s_t.mean():.3f}",
              flush=True)
        print(f"  mask      {pt_m['preset']:7s}            : "
              f"{r_m.mean():7.1f} b/s  LSD {l_m.mean():.3f}  "
              f"NSIM {s_m.mean():.3f}", flush=True)
        print(f"  paired dLSD (mask-thr) {dl.mean():+.3f} +/- "
              f"{dl.std():.3f}  (mask better {int((dl < 0).sum())}"
              f"/{n_utt}); dNSIM {dn.mean():+.3f} +/- {dn.std():.3f} "
              f"(mask better {int((dn > 0).sum())}/{n_utt})",
              flush=True)
        mask_dominated = (dl.mean() > 0 and r_m.mean() >= r_t.mean())
        verdicts.append((tag, float(r_t.mean()), float(l_t.mean()),
                         float(r_m.mean()), float(l_m.mean()),
                         mask_dominated))
    print("VERDICT:", flush=True)
    for tag, rt, lt, rm, lm, dom in verdicts:
        print(f"  {tag}: mask {'DOMINATED' if dom else 'competitive'} "
              f"(thr {lt:.3f}@{rt:.0f} vs mask {lm:.3f}@{rm:.0f})",
              flush=True)
    print("PAIRED MASK VALIDATION DONE", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400,
         sys.argv[2] if len(sys.argv) > 2 else None)
