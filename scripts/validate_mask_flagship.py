"""LEARNED-MASK flagship validation (round-2 verdict item 2).

The reference's actual listening-test encoder is the HARD MASK
(reference src/synthesis_qtz.py:93 sets model_f.scale = 1000 and
encodes through mask_enc, wavernn.py:259-310) — round 2 validated
only the threshold path at flagship scale.  This script runs the
mask codec end to end at the production config:

1. predictor 384/128 trained WITH the learned-mask objective
   (train_frame's mask_step: keep-rate penalty + scale annealing —
   warmup_batches is set BELOW the batches-per-epoch so the mask
   phase actually trains, unlike the flagship threshold run where
   every batch fell in the teacher-forced warmup),
2. reference-size codebooks trained on the MASK residual split
   (codec.use_mask=true -> train_cb uses mask_enc's streams),
3. encode val utterances through mask_enc(qtz=True) at scale 1000
   (the hard mask), range-coded with the context-conditioned models
   + shared training-set priors,
4. decode + PRODUCTION vocoder (bunched GRU_B-32, sparse ramp) ->
   decoded-audio Bark-LSD / STFT-LSD beside the threshold row.

    python scripts/validate_mask_flagship.py [pred_epochs] [voc_epochs]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np

OUT = "/tmp/fpsc_mask_flagship"


def main(pred_epochs: int = 400, voc_epochs: int = 400,
         noise: int = 2, noise_warmup: float = 0.5):
    import jax
    import jax.numpy as jnp

    from fpsc_tpu.config.config import Config, apply_overrides
    from fpsc_tpu.train import generate_qtz_features, train_cb, train_frame

    label = time.strftime("mask_%m%d_%H%M%S")
    data = [
        "data.synthetic=true", "data.synthetic_style=speech",
        "data.synthetic_utterances=96",
        "data.chunks=6", "data.batch_size=16",
    ]
    overrides = data + [
        "predictor.gru_units1=384", "predictor.gru_units2=128",
        f"train.epochs={pred_epochs}", "train.learning_rate=0.001",
        f"train.save_dir={OUT}", "train.save_every=50",
        # 96 utts / batch 16 = 6 batches per epoch: warmup_batches=1
        # leaves batches 2..6 training the MASK objective each epoch
        "train.warmup_batches=1", "train.keep_rate=0.3",
        "codec.vq_entries=1024,1024", "codec.vq_entries_bl=512",
        "codec.scl_entries=256", "codec.scl_entries_bl=16",
        f"codec.codebook_path={OUT}/cb.npz",
        "codec.entropy_coding=true",
        "codec.use_mask=true",          # the deployed reference path
    ]
    cfg = Config(label=label)
    apply_overrides(cfg, overrides)

    print("=== 1. predictor with LEARNED-MASK training ===", flush=True)
    t0 = time.time()
    _, min_loss = train_frame.run(cfg)
    print(f"{pred_epochs} epochs in {time.time()-t0:.0f}s, "
          f"min val loss {min_loss:.4f}", flush=True)

    transfer = [f"train.transfer_model={label}",
                f"train.transfer_epoch={pred_epochs - 1}"]
    print("=== 2. codebooks on MASK residual split ===", flush=True)
    cfg_cb = Config(label=label)
    apply_overrides(cfg_cb, overrides + transfer + [
        "train.debugging=true"])
    t0 = time.time()
    train_cb.run(cfg_cb)
    print(f"codebooks in {time.time()-t0:.0f}s", flush=True)

    print("=== 3. mask encode (scale=1000 hard): bitrate + MSE ===",
          flush=True)
    out = generate_qtz_features.run(cfg_cb, max_utterances=16,
                                    out_dir=f"{OUT}/qtz")
    # label-scoped codebook copy (priors already stored inside):
    # protects this artifact set from a later run's cb.npz overwrite
    import shutil
    shutil.copyfile(f"{OUT}/cb.npz", f"{OUT}/cb_{label}.npz")
    priors = out["priors"]
    print(f"coded-feature MSE {out['mse']:.6f}; rates: "
          f"{out['bitrate']:.0f} fixed / {out['bitrate_rc']:.0f} rc / "
          f"{out['bitrate_priors']:.0f} rc+priors (in-sample) b/s",
          flush=True)

    print("=== 4. PRODUCTION vocoder (bunched + sparse) ===", flush=True)
    from fpsc_tpu.train import train_lpcnet

    cfg_v = Config(label=label + "_voc")
    apply_overrides(cfg_v, data + [
        "train.learning_rate=0.001", f"train.epochs={voc_epochs}",
        f"train.save_dir={OUT}", "train.save_every=100",
        "lpcnet.bunch=2", "lpcnet.gru_b_units=32",
        "lpcnet.gru_a_density=0.2",
        "lpcnet.sparsify_start=200",
        f"lpcnet.sparsify_end={voc_epochs * 4}",
        # production vocoder recipe: noise injection with the clean
        # warmup ramp (VALIDATION.md round 3 — ramp ties always-on
        # noise per epoch and wins per wall-second)
        f"lpcnet.noise_levels={noise}",
        f"lpcnet.noise_warmup_frac={noise_warmup}",
    ])
    t0 = time.time()
    voc_params, ce = train_lpcnet.run(cfg_v)
    print(f"{voc_epochs} epochs in {time.time()-t0:.0f}s, CE {ce:.3f}",
          flush=True)

    print("=== 5. mask transmit chain -> bunched sparse kernel ===",
          flush=True)
    from fpsc_tpu.dsp.emphasis import deemphasis
    from fpsc_tpu.eval.metrics import (log_spectral_distance,
                                       stft_log_spectral_distance)
    from fpsc_tpu.train import synthesis_qtz

    cfg_s = Config(label=label)
    apply_overrides(cfg_s, overrides + transfer)
    results = synthesis_qtz.run(cfg_s, num_samples=3,
                                out_dir=f"{OUT}/samples",
                                vocoder_params=voc_params,
                                priors=priors)
    from fpsc_tpu.data.dataset import build_dataset
    from fpsc_tpu.eval.nsim import nsim
    ds = build_dataset(cfg_s.data, "val")
    lsds, slsds, rates, nsims = [], [], [], []
    for ns, batch in enumerate(ds.iter_batches(1, seed=0)):
        if ns >= len(results):
            break
        truth = deemphasis(batch["x"][0])
        y = results[ns]["wav"][:len(truth)]
        lsds.append(log_spectral_distance(truth[:len(y)], y))
        slsds.append(stft_log_spectral_distance(truth[:len(y)], y))
        rates.append(results[ns]["bitrate"])
        nsims.append(nsim(truth[:len(y)], y))
    noise = np.random.RandomState(0).randn(len(truth)).astype(
        np.float32) * truth.std()
    lsd_n = log_spectral_distance(truth, noise)
    slsd_n = stft_log_spectral_distance(truth, noise)
    print(f"MASK PATH: decoded-audio Bark-LSD {np.mean(lsds):.3f} "
          f"(noise {lsd_n:.3f}); STFT-LSD {np.mean(slsds):.2f} dB "
          f"(noise {slsd_n:.2f}); NSIM {np.mean(nsims):.3f} "
          f"(noise {nsim(truth, noise):.3f}); held-out entropy-coded "
          f"bitrate {np.mean(rates):.0f} b/s (with shared priors + "
          f"stage-conditioned models)", flush=True)
    assert np.mean(lsds) < 0.7 * lsd_n
    assert np.mean(rates) < 2000.0
    print("MASK FLAGSHIP VALIDATION PASSED", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400,
         int(sys.argv[2]) if len(sys.argv) > 2 else 400,
         int(sys.argv[3]) if len(sys.argv) > 3 else 2,
         float(sys.argv[4]) if len(sys.argv) > 4 else 0.5)
