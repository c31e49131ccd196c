"""Paired data-scaling study: does 2x corpus + 2x vocoder epochs buy
decoded-audio quality on utterances held out from BOTH training sets?

The synthetic corpus generator seeds its val split from a DIFFERENT
seed family than train (data/synthetic.py base offset 50021), and the
first N/4 val utterances are index-identical across corpus sizes — so
the 96-config val utterances are a shared, both-ways-held-out eval
set for the 96-utt flagship (`flag_0818_105804`, 400 vocoder epochs)
and the 192-utt data-scaled flagship (`flag_0819_004350`, 800
epochs).  The raw flagship rows are NOT paired (each run evaluates
its own val shuffle); this script is the paired comparison.

If the small chain's codebooks are missing (its shared cb.npz was
overwritten before label-scoping landed), they are regenerated
deterministically from its saved predictor via train_cb — the chain
is then self-consistent (books trained from this predictor's own
closed-loop residuals, the same recipe that produced the originals).

    python scripts/validate_data_scaling.py [small_label] [big_label]
"""
import glob
import os
import re
import sys
import time

sys.path.insert(0, ".")

import numpy as np

OUT = "/tmp/fpsc_flagship"


def _chain(out, label, utterances):
    """Load (params, codebooks, voc, pattern) for one flagship label,
    regenerating label-scoped codebooks if needed."""
    import jax

    from fpsc_tpu.config.config import Config, apply_overrides
    from fpsc_tpu.models import lpcnet, lpcnet_bunched
    from fpsc_tpu.ops.lpcnet_sampler import auto_block_pattern
    from fpsc_tpu.train import checkpoint as ckpt
    from fpsc_tpu.train import train_cb
    from fpsc_tpu.train.train_frame import build_model
    from scripts.validate_rate_control import (codebook_path,
                                               newest_epoch)

    epoch = newest_epoch(OUT, label)
    overrides = [
        "data.synthetic=true", "data.synthetic_style=speech",
        f"data.synthetic_utterances={utterances}",
        "data.chunks=6", "data.batch_size=16",
        "predictor.gru_units1=384", "predictor.gru_units2=128",
        f"train.save_dir={OUT}",
        "codec.vq_entries=1024,1024", "codec.vq_entries_bl=512",
        "codec.scl_entries=256", "codec.scl_entries_bl=16",
        "codec.entropy_coding=true",
    ]
    scoped = os.path.join(OUT, f"cb_{label}.npz")
    if not os.path.exists(scoped):
        print(f"[{label}] regenerating codebooks (shared cb.npz was "
              "overwritten before label-scoping)", flush=True)
        cfg_cb = Config(label=label)
        apply_overrides(cfg_cb, overrides + [
            f"codec.codebook_path={scoped}",
            f"train.transfer_model={label}",
            f"train.transfer_epoch={epoch}",
            "train.debugging=true",
        ])
        t0 = time.time()
        train_cb.run(cfg_cb)
        print(f"[{label}] codebooks in {time.time()-t0:.0f}s",
              flush=True)
    cfg = Config(label=label)
    apply_overrides(cfg, overrides + [
        f"codec.codebook_path={scoped}"])
    params = build_model(cfg, jax.random.PRNGKey(cfg.train.seed))
    params = ckpt.restore_params(
        params, ckpt.load(ckpt.checkpoint_path(OUT, label, epoch)),
        f"predictor {label}")
    books = ckpt.load_codebooks(scoped)
    vep = max(int(m.group(1)) for f in glob.glob(
        os.path.join(OUT, f"{label}_voc_s", "*.ckpt"))
        if (m := re.search(r"_(\d+)\.ckpt$", f)))
    voc = lpcnet_bunched.init_bunched(
        jax.random.PRNGKey(0), lpcnet.LPCNetConfig(gru_b_units=32))
    voc = ckpt.restore_params(
        voc, ckpt.load(ckpt.checkpoint_path(OUT, f"{label}_voc_s",
                                            vep)),
        f"vocoder {label}")
    return params, books, voc, auto_block_pattern(voc), cfg


def main(small="flag_0818_105804", big=None):
    import jax
    import jax.numpy as jnp

    from fpsc_tpu.codec.codec import encode
    from fpsc_tpu.data.dataset import build_dataset, predictor_inputs
    from fpsc_tpu.dsp import constants as C
    from fpsc_tpu.dsp.ceps2lpc import ceps2lpc
    from fpsc_tpu.dsp.emphasis import deemphasis
    from fpsc_tpu.eval.metrics import log_spectral_distance
    from fpsc_tpu.eval.stoi import stoi
    from fpsc_tpu.ops.lpcnet_sampler import pallas_generate
    from scripts.validate_rate_control import newest_label

    if big is None:
        cands = sorted(
            os.path.basename(d) for d in glob.glob(OUT + "/flag_*")
            if os.path.isdir(d) and not d.endswith("_voc_s")
            and os.path.basename(d) != small)
        if not cands:
            raise SystemExit("need a second flagship artifact set")
        big = cands[-1]
    print(f"small-data chain: {small} (96 utts, 400 voc epochs)",
          flush=True)
    print(f"big-data chain:   {big} (192 utts, 800 voc epochs)",
          flush=True)

    chains = {"96utt": _chain(OUT, small, 96),
              "192utt": _chain(OUT, big, 192)}

    # shared eval: the 96-config val split (same utterances appear in
    # the 192-config val; BOTH train seed families are disjoint)
    n_eval = 8
    cfg = chains["96utt"][4]
    ds = build_dataset(cfg.data, "val")
    batch = next(ds.iter_batches(n_eval, seed=0))
    feat = predictor_inputs(batch, cfg.data.normalize)
    truth = [deemphasis(batch["x"][i]) for i in range(n_eval)]

    per = {}
    for tag, (params, books, voc, pat, _) in chains.items():
        enc = encode(params, books, jnp.asarray(feat),
                     l1=0.09, l2=0.28)
        coded = np.asarray(enc["coded"])
        coded_un = coded * C.MAXI
        periods = (0.1 + 50.0 * coded_un[..., 18] + 100.0
                   ).astype(np.int32)
        _, lpc, _ = ceps2lpc(jnp.asarray(
            coded_un.reshape(-1, 20)[:, :18]))
        lpc = np.asarray(lpc).reshape(coded_un.shape[0], -1, 16)
        y = np.asarray(pallas_generate(
            voc, jnp.asarray(coded), jnp.asarray(periods),
            jnp.asarray(lpc), jax.random.PRNGKey(7),
            corr=jnp.asarray(coded_un[..., 19]), gru_a_pattern=pat))
        lsds, stois = [], []
        for i in range(n_eval):
            n = min(len(truth[i]), y.shape[1])
            lsds.append(log_spectral_distance(truth[i][:n], y[i, :n]))
            try:
                stois.append(stoi(truth[i][:n], y[i, :n]))
            except ValueError:
                stois.append(np.nan)
        per[tag] = (np.asarray(lsds), np.asarray(stois))
        print(f"{tag:7s}: Bark-LSD {np.mean(lsds):.3f} "
              f"(per-utt {' '.join(f'{v:.2f}' for v in lsds)}), "
              f"STOI {np.nanmean(stois):.3f}", flush=True)

    noise = np.random.RandomState(0).randn(
        len(truth[0])).astype(np.float32) * truth[0].std()
    lsd_noise = log_spectral_distance(truth[0], noise)
    d_lsd = per["192utt"][0] - per["96utt"][0]
    d_stoi = per["192utt"][1] - per["96utt"][1]
    se = d_lsd.std() / np.sqrt(n_eval)
    print(f"(noise floor {lsd_noise:.3f})", flush=True)
    print(f"paired delta (192utt - 96utt): Bark-LSD {d_lsd.mean():+.3f}"
          f" +/- {d_lsd.std():.3f} (SE {se:.3f}), "
          f"STOI {np.nanmean(d_stoi):+.3f}", flush=True)
    for tag in per:
        assert per[tag][0].mean() < 0.7 * lsd_noise, (tag, per[tag])
    print("DATA SCALING STUDY DONE", flush=True)


if __name__ == "__main__":
    main(*(sys.argv[1:3] or ["flag_0818_105804"]))
