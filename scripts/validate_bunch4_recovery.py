"""bunch=4 quality recovery (round-2 verdict item 8).

Round 2 measured the bunch=4 sampler at 2371-2419x RTF but Bark-LSD
0.704 (GRU_B 64) vs bunch=2's 0.534 at the 96-utterance / 400-epoch
budget — a 0.17 gap that kept the 4-sample path opt-in.  The
exposure-bias attack (mu-law noise injection, lpcnet.noisy_streams)
hits bunch=4 hardest: with four samples per recurrent step the model
free-runs 4x further between state updates, compounding input
mismatch.  This script re-runs the same budget with noise injection
on both bunch=2 (the moving bar) and bunch=4 (GRU_B 64):

    python scripts/validate_bunch4_recovery.py [epochs] [utts]

Done criterion (VERDICT.md): bunch=4 within 0.1 Bark-LSD of bunch=2
at the same budget.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def run_arm(name, epochs, utts, extra):
    import jax
    import jax.numpy as jnp

    from fpsc_tpu.config.config import Config, apply_overrides
    from fpsc_tpu.data.dataset import build_dataset
    from fpsc_tpu.dsp.emphasis import deemphasis
    from fpsc_tpu.eval.metrics import (log_spectral_distance,
                                       stft_log_spectral_distance)
    from fpsc_tpu.ops.lpcnet_sampler import pallas_generate
    from fpsc_tpu.train import train_lpcnet
    from fpsc_tpu.train.train_lpcnet import vocoder_inputs

    base = [
        "data.synthetic=true", "data.synthetic_style=speech",
        f"data.synthetic_utterances={utts}", "data.chunks=6",
        "data.batch_size=16",
        "train.learning_rate=0.001", f"train.epochs={epochs}",
        "train.save_dir=/tmp/fpsc_b4rec", "train.save_every=1000000",
    ]
    cfg = Config(label=time.strftime(f"{name}_%m%d_%H%M%S"))
    apply_overrides(cfg, base + extra)
    t0 = time.time()
    params, ce = train_lpcnet.run(cfg)
    print(f"{name}: {epochs} ep in {time.time()-t0:.0f}s, CE {ce:.3f}",
          flush=True)

    ds = build_dataset(cfg.data, "val")
    batch = next(ds.iter_batches(4, seed=0))
    arrs = vocoder_inputs(batch)
    from fpsc_tpu.ops.lpcnet_sampler import auto_block_pattern
    y = np.asarray(pallas_generate(
        params, jnp.asarray(arrs["feat"]),
        jnp.asarray(arrs["periods"]), jnp.asarray(arrs["lpc"]),
        jax.random.PRNGKey(0),
        gru_a_pattern=auto_block_pattern(params)))
    truth = deemphasis(arrs["x"])
    lsds = [log_spectral_distance(truth[i], y[i]) for i in range(4)]
    slsds = [stft_log_spectral_distance(truth[i], y[i])
             for i in range(4)]
    try:
        from fpsc_tpu.eval.stoi import stoi
        sto = float(np.mean([stoi(truth[i], y[i]) for i in range(4)]))
        sto_msg = f", STOI {sto:.3f}"
    except ValueError:          # clips too short for 384 ms segments
        sto_msg = ""
    print(f"{name}: Bark-LSD {np.mean(lsds):.3f}, "
          f"STFT-LSD {np.mean(slsds):.2f} dB{sto_msg}", flush=True)
    return float(np.mean(lsds)), float(np.mean(slsds))


def main(epochs: int = 400, utts: int = 96, arm_filter: str = ""):
    results = {}
    arms = {
        "b2_noise": ["lpcnet.bunch=2", "lpcnet.gru_b_units=32",
                     "lpcnet.noise_levels=2"],
        "b4gb64_noise": ["lpcnet.bunch=4", "lpcnet.gru_b_units=64",
                         "lpcnet.noise_levels=2"],
        "b4gb64_clean": ["lpcnet.bunch=4", "lpcnet.gru_b_units=64"],
        # production-style block sparsity on top of the recovery
        # recipe: quality gate for adding bunch4+sparse to the bench
        # headline (the flagship bunch2 recipe trains the same ramp)
        "b4gb64_noise_sparse": [
            "lpcnet.bunch=4", "lpcnet.gru_b_units=64",
            "lpcnet.noise_levels=2", "lpcnet.gru_a_density=0.2",
            "lpcnet.sparsify_start=200",
            f"lpcnet.sparsify_end={epochs * 4}"],
    }
    if arm_filter:
        keep = set(arm_filter.split(","))
        arms = {k: v for k, v in arms.items() if k in keep}
    for name, extra in arms.items():
        results[name] = run_arm(name, epochs, utts, extra)
    print("\n=== bunch=4 recovery summary ===", flush=True)
    for name, (lsd, slsd) in results.items():
        print(f"{name:14s} Bark-LSD {lsd:.3f}  STFT {slsd:.2f} dB",
              flush=True)
    if "b4gb64_noise" in results and "b2_noise" in results:
        gap = results["b4gb64_noise"][0] - results["b2_noise"][0]
        print(f"bunch4(noise) - bunch2(noise) gap: {gap:+.3f} Bark-LSD "
              f"({'MEETS' if gap <= 0.1 else 'misses'} the 0.1 target); "
              f"round-2 record: b2 0.534 / b4gb64 0.704 (gap 0.17)",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400,
         int(sys.argv[2]) if len(sys.argv) > 2 else 96,
         sys.argv[3] if len(sys.argv) > 3 else "")
