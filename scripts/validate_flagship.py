"""PRODUCTION-CONFIG validation: the flagship codec end to end.

Runs the deployed configuration on the speech-realistic fixtures at
the largest in-repo data budget: production predictor (384/128),
reference-size codebooks (scl 256 + VQ 1024x2 above threshold,
scl 16 + VQ 512 below), entropy-coded bitstream, and the PRODUCTION
vocoder - bunched (lpcnet.bunch=2, GRU_B 32) with the GRU_A
block-sparsity ramp to 0.2 density - synthesising through the fused
kernel's bunch=2 + static-block-sparse path (the bench.py headline
configuration, quality-checked here on decoded features).

    python scripts/validate_flagship.py [pred_epochs] [voc_epochs] [style] [noise] [noise_warmup_frac] [utterances] [voc_batch]

voc_batch (default 16) sets the VOCODER stage's batch size — the
round-5 wide-batch recipe (data.batch_size=48: 3x the samples/step at
near-constant step latency, decodes better per wall-second than B=16;
VALIDATION.md round 5).  Scale voc_epochs to match wall budgets when
comparing across batch sizes (B=48 epochs run ~1.5x faster).

style defaults to "speech"; pass "speech_hard" for the multi-speaker +
additive-noise stress regime (round-2 verdict item 10).

noise (mu-law noise-injection levels during vocoder training) defaults
to 2 — the production recipe: at the converged 96-utt budget the
noise-trained bunched vocoder decodes to Bark-LSD 0.540 vs 0.616
clean (measured 2026-08, same 400-epoch vocoder budget).  Pass 0 for
the clean arm; at SHORT budgets (e.g. the 600 s equal-wall-time A/B)
noise injection trains slower per epoch and measures negative — see
VALIDATION.md round 3.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np

OUT = "/tmp/fpsc_flagship"


def main(pred_epochs: int = 400, voc_epochs: int = 400,
         style: str = "speech", noise: int = 2,
         noise_warmup: float = 0.0, utterances: int = 96,
         voc_batch: int = 16):
    import jax
    import jax.numpy as jnp

    from fpsc_tpu.config.config import Config, apply_overrides
    from fpsc_tpu.train import generate_qtz_features, train_cb, train_frame

    label = time.strftime("flag_%m%d_%H%M%S")
    data = [
        "data.synthetic=true", f"data.synthetic_style={style}",
        f"data.synthetic_utterances={utterances}",
        "data.chunks=6", "data.batch_size=16",
    ]
    overrides = data + [
        "predictor.gru_units1=384", "predictor.gru_units2=128",
        f"train.epochs={pred_epochs}", "train.learning_rate=0.001",
        f"train.save_dir={OUT}", "train.save_every=50",
        # reference production codebook geometry (README.md:26-29)
        "codec.vq_entries=1024,1024", "codec.vq_entries_bl=512",
        "codec.scl_entries=256", "codec.scl_entries_bl=16",
        f"codec.codebook_path={OUT}/cb.npz",
        "codec.entropy_coding=true",
    ]
    cfg = Config(label=label)
    apply_overrides(cfg, overrides)

    print(f"=== 1. predictor (384/128, {utterances} utts) ===",
          flush=True)
    t0 = time.time()
    _, min_loss = train_frame.run(cfg)
    print(f"{pred_epochs} epochs in {time.time()-t0:.0f}s, "
          f"min val loss {min_loss:.4f}", flush=True)

    transfer = [f"train.transfer_model={label}",
                f"train.transfer_epoch={pred_epochs - 1}"]
    print("=== 2. codebooks (1024x2 + 512, reference sizes) ===",
          flush=True)
    cfg_cb = Config(label=label)
    apply_overrides(cfg_cb, overrides + transfer + [
        "train.debugging=true"])
    t0 = time.time()
    train_cb.run(cfg_cb)
    print(f"codebooks in {time.time()-t0:.0f}s", flush=True)

    print("=== 3. encode 16 utterances: bitrate + MSE ===", flush=True)
    out = generate_qtz_features.run(cfg_cb, max_utterances=16,
                                    out_dir=f"{OUT}/qtz")
    # label-scoped codebook copy (AFTER generate_qtz_features, which
    # stores the entropy priors inside the npz): a LATER flagship run
    # overwrites the shared cb.npz, silently orphaning this run's
    # predictor — downstream scripts resolve cb_<label>.npz first
    import shutil
    shutil.copyfile(f"{OUT}/cb.npz", f"{OUT}/cb_{label}.npz")
    priors = out["priors"]
    print(f"coded-feature MSE {out['mse']:.6f}; "
          f"fixed-layout bitrate {out['bitrate']:.0f} b/s; "
          f"usage entropies {out['entropies']}", flush=True)

    print("=== 4. PRODUCTION vocoder: bunched + sparse ramp ===",
          flush=True)
    from fpsc_tpu.train import train_lpcnet

    cfg_v = Config(label=label + "_voc")
    apply_overrides(cfg_v, data + [
        # round-5 wide-batch recipe (equal-wall-time A/B: B=48 decodes
        # BETTER than B=16 per wall-second — VALIDATION.md round 5);
        # later override wins over data's batch_size=16
        f"data.batch_size={voc_batch}",
        "train.learning_rate=0.001", f"train.epochs={voc_epochs}",
        f"train.save_dir={OUT}", "train.save_every=100",
        "lpcnet.bunch=2", "lpcnet.gru_b_units=32",
        "lpcnet.gru_a_density=0.2",
        "lpcnet.sparsify_start=200",
        f"lpcnet.sparsify_end={voc_epochs * 4}",
        f"lpcnet.noise_levels={noise}",
        f"lpcnet.noise_warmup_frac={noise_warmup}",
    ])
    t0 = time.time()
    voc_params, ce = train_lpcnet.run(cfg_v)
    wh = np.asarray(voc_params.base.gru_a.wh)
    blocks = wh.reshape(wh.shape[0] // 64, 64, wh.shape[1] // 64, 64)
    live = float((np.abs(blocks).sum((1, 3)) > 0).mean())
    print(f"{voc_epochs} epochs in {time.time()-t0:.0f}s, CE {ce:.3f}, "
          f"GRU_A live-block fraction {live:.3f}", flush=True)

    print("=== 5. full transmit chain -> bunched sparse kernel ===",
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
    from fpsc_tpu.eval.stoi import stoi
    ds = build_dataset(cfg_s.data, "val")
    lsds, slsds, rates, stois, nsims = [], [], [], [], []
    for ns, batch in enumerate(ds.iter_batches(1, seed=0)):
        if ns >= len(results):
            break
        truth = deemphasis(batch["x"][0])
        y = results[ns]["wav"][:len(truth)]
        lsds.append(log_spectral_distance(truth[:len(y)], y))
        slsds.append(stft_log_spectral_distance(truth[:len(y)], y))
        rates.append(results[ns]["bitrate"])
        nsims.append(nsim(truth[:len(y)], y))
        try:
            stois.append(stoi(truth[:len(y)], y))
        except ValueError:      # fixture too short for 384 ms segments
            pass
    noise_sig = np.random.RandomState(0).randn(len(truth)).astype(
        np.float32) * truth.std()
    lsd_n = log_spectral_distance(truth, noise_sig)
    slsd_n = stft_log_spectral_distance(truth, noise_sig)
    st_msg = (f"; STOI {np.mean(stois):.3f} "
              f"(noise {stoi(truth, noise_sig):.3f})" if stois else "")
    st_msg += (f"; NSIM {np.mean(nsims):.3f} "
               f"(noise {nsim(truth, noise_sig):.3f})")
    print(f"decoded-audio Bark-LSD {np.mean(lsds):.3f} "
          f"(noise {lsd_n:.3f}); STFT-LSD {np.mean(slsds):.2f} dB "
          f"(noise {slsd_n:.2f}); entropy-coded bitrate "
          f"{np.mean(rates):.0f} b/s{st_msg}", flush=True)
    assert np.mean(lsds) < 0.7 * lsd_n
    assert np.mean(rates) < 2000.0
    print("FLAGSHIP VALIDATION PASSED", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400,
         int(sys.argv[2]) if len(sys.argv) > 2 else 400,
         sys.argv[3] if len(sys.argv) > 3 else "speech",
         int(sys.argv[4]) if len(sys.argv) > 4 else 2,
         float(sys.argv[5]) if len(sys.argv) > 5 else 0.0,
         int(sys.argv[6]) if len(sys.argv) > 6 else 96,
         int(sys.argv[7]) if len(sys.argv) > 7 else 16)
