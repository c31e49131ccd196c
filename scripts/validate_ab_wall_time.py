"""Equal-WALL-TIME bunched-vs-unbunched A/B at scale (round-2 verdict
item 1).

The 192-utterance equal-UPDATE-COUNT comparison showed a 0.16 Bark-LSD
gap (unbunched 0.650 vs bunched 0.809) — but bunched training runs
~2x faster per epoch, so the deployment-relevant comparison is equal
WALL TIME.  This script trains four arms on the same 192-utterance
speech-realistic corpus under one wall-clock budget each:

    bunch1        — unbunched baseline
    bunch2        — bunched, GRU_B 32 (the deployed config)
    bunch1+noise  — unbunched with mu-law noise injection
    bunch2+noise  — bunched with noise injection (the exposure-bias
                    attack: lpcnet.noisy_streams)

and reports free-running Bark-LSD / STFT-LSD on 4 held-out utterances
through the fused Pallas sampler.  Decision rule (VERDICT.md): bunched
within <= 0.05 Bark-LSD of unbunched at equal wall time keeps the
bunched default; otherwise the default reverts to sparse-unbunched.

    python scripts/validate_ab_wall_time.py [budget_seconds] [utts] [arms]

arms: comma-separated subset of bunch1,bunch2,bunch1_noise,bunch2_noise
(default: all four).

MEASURED (600 s budget, 192 utts, 2026-08-17): bunch1 0.603 /
bunch2 0.664 (gap 0.060, vs 0.16 at equal update count) — and noise
injection was NEGATIVE at this budget for both arms (0.749 / 0.880):
the noisy-input task trains slower than the budget can absorb.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def train_arm(name, budget_s, utts, extra):
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
        "train.learning_rate=0.001", "train.epochs=100000",
        f"train.max_seconds={budget_s}",
        "train.save_dir=/tmp/fpsc_ab_wall", "train.save_every=1000000",
    ]
    cfg = Config(label=time.strftime(f"{name}_%m%d_%H%M%S"))
    apply_overrides(cfg, base + extra)
    t0 = time.time()
    params, ce = train_lpcnet.run(cfg)
    wall = time.time() - t0
    print(f"{name}: trained {wall:.0f}s wall, min CE {ce:.3f}",
          flush=True)

    ds = build_dataset(cfg.data, "val")
    batch = next(ds.iter_batches(4, seed=0))
    arrs = vocoder_inputs(batch)
    y = np.asarray(pallas_generate(
        params, jnp.asarray(arrs["feat"]),
        jnp.asarray(arrs["periods"]), jnp.asarray(arrs["lpc"]),
        jax.random.PRNGKey(0)))
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
    noise = np.random.RandomState(0).randn(*truth[0].shape) * np.std(
        truth[0])
    print(f"{name}: Bark-LSD {np.mean(lsds):.3f} "
          f"(noise {log_spectral_distance(truth[0], noise):.3f}), "
          f"STFT-LSD {np.mean(slsds):.2f} dB{sto_msg}", flush=True)
    return float(np.mean(lsds)), float(np.mean(slsds)), ce


def main(budget_s: float = 600.0, utts: int = 192,
         arm_filter: str = ""):
    # absorb the session's per-process first-jit penalty before any
    # arm's clock can see it
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    float(jax.jit(lambda a: jnp.sum(a))(jnp.ones(8)))
    print(f"backend warmup {time.time()-t0:.0f}s", flush=True)
    arms = {
        "bunch1": [],
        "bunch2": ["lpcnet.bunch=2", "lpcnet.gru_b_units=32"],
        "bunch2_gb64": ["lpcnet.bunch=2", "lpcnet.gru_b_units=64"],
        "bunch1_noise": ["lpcnet.noise_levels=2"],
        "bunch2_noise": ["lpcnet.bunch=2", "lpcnet.gru_b_units=32",
                         "lpcnet.noise_levels=2"],
        # ramp-in schedule (ROADMAP item 4): clean for the first half
        # of the budget, then noise injection — tests whether the ramp
        # rescues noise at budgets where always-on noise is negative
        "bunch2_ramp": ["lpcnet.bunch=2", "lpcnet.gru_b_units=32",
                        "lpcnet.noise_levels=2",
                        "lpcnet.noise_warmup_frac=0.5"],
        # round-5 wide-batch training arm (VERDICT r4 next #2): the
        # production recipe at batch 48 — 3x the samples per step at
        # near-constant step latency (scripts/bench_train_scaling.py)
        # — vs the same recipe at batch 16 under equal wall time.
        # (bunch=2 at B=48 stays under the 2 GiB activation boundary;
        # unbunched wide arms need lpcnet.loss_fn(time_chunks=n).)
        "bunch2_ramp_b48": ["lpcnet.bunch=2", "lpcnet.gru_b_units=32",
                            "lpcnet.noise_levels=2",
                            "lpcnet.noise_warmup_frac=0.5",
                            "data.batch_size=48"],
    }
    if arm_filter:
        keep = set(arm_filter.split(","))
        arms = {k: v for k, v in arms.items() if k in keep}
    results = {}
    for name, extra in arms.items():
        results[name] = train_arm(name, budget_s, utts, extra)

    print("\n=== equal-wall-time summary (budget "
          f"{budget_s:.0f}s, {utts} utts) ===", flush=True)
    for name, (lsd, slsd, ce) in results.items():
        print(f"{name:14s} Bark-LSD {lsd:.3f}  STFT {slsd:.2f} dB  "
              f"CE {ce:.3f}", flush=True)
    b1 = [results[k][0] for k in results if k.startswith("bunch1")]
    b2 = [results[k][0] for k in results if k.startswith("bunch2")]
    if b1 and b2:       # the bunched-vs-unbunched decision rule
        gap = min(b2) - min(b1)
        print(f"bunched gap at equal wall time: {gap:+.3f} Bark-LSD "
              f"({'within' if gap <= 0.05 else 'OUTSIDE'} the 0.05 "
              f"deployment tolerance)", flush=True)


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 600.0,
         int(sys.argv[2]) if len(sys.argv) > 2 else 192,
         sys.argv[3] if len(sys.argv) > 3 else "")
