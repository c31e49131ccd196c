"""int8 weight-only sampler quality gate on the TRAINED flagship
vocoder (VERDICT round 3 next #2).

The fused Pallas sampler can store every sample-rate matmul weight as
int8 + per-output-row f32 scales, dequantising in-kernel
(`pallas_generate(..., weights_int8=True)`) — the TPU-native analogue
of the reference's deployed 8-bit LPCNet inference (reference
README.md:36-40).  Interpret-mode parity with the dequantised-float
oracle lives in tests/test_pallas_sampler.py; THIS script measures
what quantisation costs in the listening domain on real trained
weights:

1. load the saved flagship bunch=2 vocoder + coded features
   (run `scripts/validate_flagship.py` first, or pass a label);
2. synthesise held-out utterances with the bf16 kernel and the int8
   kernel from the same uniforms;
3. compare decoded-audio Bark-LSD / STFT-LSD vs ground truth and
   assert the int8 delta is bounded (|dLSD| <= 0.05) and both beat
   the noise floor.

    python scripts/validate_int8.py [label] [epoch]
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

    from fpsc_tpu.codec.codec import encode
    from fpsc_tpu.config.config import Config, apply_overrides
    from fpsc_tpu.data.dataset import build_dataset, predictor_inputs
    from fpsc_tpu.dsp import constants as C
    from fpsc_tpu.dsp.ceps2lpc import ceps2lpc
    from fpsc_tpu.dsp.emphasis import deemphasis
    from fpsc_tpu.eval.metrics import (log_spectral_distance,
                                       stft_log_spectral_distance)
    from fpsc_tpu.eval.nsim import nsim
    from fpsc_tpu.models import lpcnet, lpcnet_bunched
    from fpsc_tpu.ops.lpcnet_sampler import (auto_block_pattern,
                                             pallas_generate)
    from fpsc_tpu.train import checkpoint as ckpt
    from fpsc_tpu.train.train_frame import build_model
    from scripts.validate_rate_control import codebook_path

    if label is None:
        cands = [os.path.basename(d) for d in glob.glob(OUT + "/flag_*")
                 if os.path.isdir(d) and not d.endswith("_voc_s")]
        if not cands:
            raise SystemExit("no flagship artifacts — run "
                             "scripts/validate_flagship.py first")
        label = sorted(cands)[-1]
    if epoch is None:
        epoch = max(int(m.group(1)) for f in glob.glob(
            os.path.join(OUT, label, f"{label}_*.ckpt"))
            if (m := re.search(r"_(\d+)\.ckpt$", f)))
    print(f"artifacts: {label} epoch {epoch}", flush=True)

    # predictor + codebooks -> coded features for held-out utterances
    cfg = Config(label=label)
    apply_overrides(cfg, [
        "data.synthetic=true", "data.synthetic_style=speech",
        "data.synthetic_utterances=96", "data.chunks=6",
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
    coded_un = coded * (C.MAXI if cfg.data.normalize else 1.0)
    periods = (0.1 + 50.0 * coded_un[..., 18] + 100.0).astype(np.int32)
    _, lpc, _ = ceps2lpc(jnp.asarray(coded_un.reshape(-1, 20)[:, :18]))
    lpc = np.asarray(lpc).reshape(coded_un.shape[0], -1, 16)

    # saved bunch=2 vocoder
    vdir = os.path.join(OUT, f"{label}_voc_s")
    vep = max(int(m.group(1)) for f in glob.glob(
        os.path.join(vdir, "*.ckpt"))
        if (m := re.search(r"_(\d+)\.ckpt$", f)))
    lcfg = lpcnet.LPCNetConfig(gru_b_units=32)
    voc = lpcnet_bunched.init_bunched(jax.random.PRNGKey(0), lcfg)
    voc = ckpt.restore_params(
        voc, ckpt.load(ckpt.checkpoint_path(OUT, f"{label}_voc_s", vep)),
        "vocoder (bunch=2)")
    pat = auto_block_pattern(voc)
    truth = [deemphasis(batch["x"][i]) for i in range(4)]

    rows = {}
    for tag, kw in (("bf16", {}), ("int8", {"weights_int8": True})):
        t0 = time.time()
        y = np.asarray(pallas_generate(
            voc, jnp.asarray(coded), jnp.asarray(periods),
            jnp.asarray(lpc), jax.random.PRNGKey(7),
            corr=jnp.asarray(coded_un[..., 19]), gru_a_pattern=pat,
            **kw))
        lsds, slsds, nsims = [], [], []
        for i in range(4):
            n = min(len(truth[i]), y.shape[1])
            lsds.append(log_spectral_distance(truth[i][:n], y[i, :n]))
            slsds.append(stft_log_spectral_distance(truth[i][:n],
                                                    y[i, :n]))
            nsims.append(nsim(truth[i][:n], y[i, :n]))
        rows[tag] = (float(np.mean(lsds)), float(np.mean(slsds)),
                     float(np.mean(nsims)))
        print(f"{tag}: Bark-LSD {rows[tag][0]:.3f}, "
              f"STFT-LSD {rows[tag][1]:.2f} dB, "
              f"NSIM {rows[tag][2]:.3f} "
              f"({time.time()-t0:.0f}s incl. compile)", flush=True)

    noise = np.random.RandomState(0).randn(
        len(truth[0])).astype(np.float32) * truth[0].std()
    lsd_noise = log_spectral_distance(truth[0], noise)
    print(f"(noise floor {lsd_noise:.3f}, NSIM "
          f"{nsim(truth[0], noise):.3f})", flush=True)

    d = rows["int8"][0] - rows["bf16"][0]
    dn = rows["int8"][2] - rows["bf16"][2]
    print(f"int8 - bf16 Bark-LSD delta: {d:+.3f}  "
          f"NSIM delta: {dn:+.3f}", flush=True)
    assert rows["int8"][0] < 0.7 * lsd_noise, rows
    assert abs(d) <= 0.05, (
        f"int8 quantisation costs too much quality: {d:+.3f}")
    print("INT8 VALIDATION PASSED", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None,
         int(sys.argv[2]) if len(sys.argv) > 2 else None)
