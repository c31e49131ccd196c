"""int8 capacity study: does a bigger GRU_A buy decoded-audio quality
at the flagship config?

bench.py's int8 rows showed weight-only int8 halves the sampler's
persistent weight VMEM at parity RTF, i.e. it buys CAPACITY: a
GRU_A-640 sampler fits in the VMEM budget a bf16 GRU_A-384 needed,
and still runs 1675x real time (57% analytic MFU) — 3.3x the >500x
target.  This script measures whether that capacity converts to
quality: train a GRU_A-640 bunched vocoder with the production
recipe (same data, same epochs, sparsity ramp + noise ramp-in) and
compare decoded-audio Bark-LSD against the SAVED GRU_A-384 flagship
vocoder on the same coded features, both synthesised through the
int8 kernel.

Reuses the saved flagship artifacts (run validate_flagship.py first):

    python scripts/validate_capacity.py [voc_epochs] [label] [gru_a]
"""
import glob
import os
import re
import sys
import time

sys.path.insert(0, ".")

import numpy as np

OUT = "/tmp/fpsc_flagship"


def main(voc_epochs: int = 400, label=None, gru_a: int = 640):
    import jax
    import jax.numpy as jnp

    from fpsc_tpu.codec.codec import encode
    from fpsc_tpu.config.config import Config, apply_overrides
    from fpsc_tpu.data.dataset import build_dataset, predictor_inputs
    from fpsc_tpu.dsp import constants as C
    from fpsc_tpu.dsp.ceps2lpc import ceps2lpc
    from fpsc_tpu.dsp.emphasis import deemphasis
    from fpsc_tpu.eval.metrics import (log_spectral_distance,
                                       stft_log_spectral_distance)
    from fpsc_tpu.models import lpcnet, lpcnet_bunched
    from fpsc_tpu.ops.lpcnet_sampler import (auto_block_pattern,
                                             pallas_generate)
    from fpsc_tpu.train import checkpoint as ckpt
    from fpsc_tpu.train import train_lpcnet
    from fpsc_tpu.train.train_frame import build_model
    from scripts.validate_rate_control import (codebook_path,
                                                newest_epoch,
                                                newest_label)

    label = label or newest_label(OUT, "flag_")
    epoch = newest_epoch(OUT, label)
    print(f"artifacts: {label} epoch {epoch}", flush=True)

    data = [
        "data.synthetic=true", "data.synthetic_style=speech",
        "data.synthetic_utterances=96",
        "data.chunks=6", "data.batch_size=16",
    ]

    # --- train the GRU_A-<gru_a> vocoder, production recipe ---
    print(f"=== 1. GRU_A-{gru_a} bunched vocoder "
          f"({voc_epochs} epochs) ===", flush=True)
    cfg_v = Config(label=time.strftime(f"cap{gru_a}_%m%d_%H%M%S"))
    apply_overrides(cfg_v, data + [
        "train.learning_rate=0.001", f"train.epochs={voc_epochs}",
        f"train.save_dir={OUT}", "train.save_every=200",
        "lpcnet.bunch=2", "lpcnet.gru_b_units=32",
        f"lpcnet.gru_a_units={gru_a}",
        "lpcnet.gru_a_density=0.2",
        "lpcnet.sparsify_start=200",
        f"lpcnet.sparsify_end={voc_epochs * 4}",
        "lpcnet.noise_levels=2", "lpcnet.noise_warmup_frac=0.5",
    ])
    t0 = time.time()
    big, ce = train_lpcnet.run(cfg_v)
    print(f"{voc_epochs} epochs in {time.time()-t0:.0f}s, CE {ce:.3f}",
          flush=True)

    # --- saved flagship GRU_A-384 vocoder ---
    vdir = os.path.join(OUT, f"{label}_voc_s")
    vep = max(int(m.group(1)) for f in glob.glob(
        os.path.join(vdir, "*.ckpt"))
        if (m := re.search(r"_(\d+)\.ckpt$", f)))
    lcfg = lpcnet.LPCNetConfig(gru_b_units=32)
    base = lpcnet_bunched.init_bunched(jax.random.PRNGKey(0), lcfg)
    base = ckpt.restore_params(
        base, ckpt.load(ckpt.checkpoint_path(OUT, f"{label}_voc_s",
                                             vep)),
        "flagship vocoder (bunch=2, GRU_A 384)")

    # --- coded features from the saved predictor + codebooks ---
    cfg = Config(label=label)
    apply_overrides(cfg, data + [
        "predictor.gru_units1=384", "predictor.gru_units2=128",
        f"train.save_dir={OUT}",
        f"codec.codebook_path={codebook_path(OUT, label)}",
    ])
    params = build_model(cfg, jax.random.PRNGKey(cfg.train.seed))
    params = ckpt.restore_params(
        params, ckpt.load(ckpt.checkpoint_path(OUT, label, epoch)),
        "predictor")
    codebooks = ckpt.load_codebooks(cfg.codec.codebook_path)
    ds = build_dataset(cfg.data, "val")
    batch = next(ds.iter_batches(4, seed=0))
    feat = predictor_inputs(batch, cfg.data.normalize)
    enc = encode(params, codebooks, jnp.asarray(feat),
                 l1=0.09, l2=0.28)
    coded = np.asarray(enc["coded"])
    coded_un = coded * C.MAXI
    periods = (0.1 + 50.0 * coded_un[..., 18] + 100.0).astype(np.int32)
    _, lpc, _ = ceps2lpc(jnp.asarray(coded_un.reshape(-1, 20)[:, :18]))
    lpc = np.asarray(lpc).reshape(coded_un.shape[0], -1, 16)
    truth = [deemphasis(batch["x"][i]) for i in range(4)]

    print("=== 2. decoded-audio quality, int8 kernel ===", flush=True)
    rows = {}
    for tag, voc in ((f"gru_a {gru_a}", big), ("gru_a 384", base)):
        pat = auto_block_pattern(voc)
        y = np.asarray(pallas_generate(
            voc, jnp.asarray(coded), jnp.asarray(periods),
            jnp.asarray(lpc), jax.random.PRNGKey(7),
            corr=jnp.asarray(coded_un[..., 19]), gru_a_pattern=pat,
            weights_int8=True))
        lsds, slsds = [], []
        for i in range(4):
            n = min(len(truth[i]), y.shape[1])
            lsds.append(log_spectral_distance(truth[i][:n], y[i, :n]))
            slsds.append(stft_log_spectral_distance(truth[i][:n],
                                                    y[i, :n]))
        rows[tag] = (float(np.mean(lsds)), float(np.mean(slsds)))
        print(f"{tag:10s}: Bark-LSD {rows[tag][0]:.3f}, "
              f"STFT-LSD {rows[tag][1]:.2f} dB", flush=True)

    noise = np.random.RandomState(0).randn(
        len(truth[0])).astype(np.float32) * truth[0].std()
    lsd_noise = log_spectral_distance(truth[0], noise)
    print(f"(noise floor {lsd_noise:.3f})", flush=True)

    big_lsd = rows[f"gru_a {gru_a}"][0]
    base_lsd = rows["gru_a 384"][0]
    print(f"capacity delta (bigger - flagship): "
          f"{big_lsd - base_lsd:+.3f} Bark-LSD", flush=True)
    assert big_lsd < 0.7 * lsd_noise, rows
    # the study is informative either way; the contract is only that
    # the big model trains to flagship-grade quality (within 0.08)
    assert big_lsd <= base_lsd + 0.08, rows
    print("CAPACITY VALIDATION PASSED", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400,
         sys.argv[2] if len(sys.argv) > 2 else None,
         int(sys.argv[3]) if len(sys.argv) > 3 else 640)
