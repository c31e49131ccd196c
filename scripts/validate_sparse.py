"""Sparse-GRU_A quality validation: train the production-size LPCNet
dense and with the cubic ramp to 0.2 block density (64x64 blocks, the
kernel's static-pattern geometry), same budget, same data; verify the
sparse model's synthesis quality stays within tolerance of dense and
that the derived block pattern drives the fused kernel.

    python scripts/validate_sparse.py [epochs]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(epochs: int = 150):
    import jax
    import jax.numpy as jnp

    from fpsc_tpu.config.config import Config, apply_overrides
    from fpsc_tpu.data.dataset import build_dataset
    from fpsc_tpu.dsp.emphasis import deemphasis
    from fpsc_tpu.eval.metrics import (log_spectral_distance,
                                       stft_log_spectral_distance)
    from fpsc_tpu.ops.lpcnet_sampler import (derive_block_pattern,
                                             pallas_generate)
    from fpsc_tpu.train import train_lpcnet
    from fpsc_tpu.train.train_lpcnet import vocoder_inputs

    base = [
        "data.synthetic=true", "data.synthetic_style=speech",
        "data.synthetic_utterances=24", "data.chunks=4",
        "data.batch_size=8",
        "train.learning_rate=0.001", f"train.epochs={epochs}",
        "train.save_dir=/tmp/fpsc_sparse", "train.save_every=100",
    ]
    results = {}
    for name, extra in (
        ("dense", []),
        ("sparse", ["lpcnet.gru_a_density=0.2",
                    "lpcnet.sparsify_start=20",
                    f"lpcnet.sparsify_end={epochs * 3 // 2}",
                    "lpcnet.sparsify_block=64,64"]),
    ):
        cfg = Config(label=time.strftime(f"{name}_%m%d_%H%M%S"))
        apply_overrides(cfg, base + extra)
        t0 = time.time()
        params, ce = train_lpcnet.run(cfg)
        print(f"{name}: {epochs} epochs in {time.time()-t0:.0f}s, "
              f"CE {ce:.3f}", flush=True)

        ds = build_dataset(cfg.data, "val")
        batch = next(ds.iter_batches(2, seed=0))
        arrs = vocoder_inputs(batch)
        pattern = None
        if name == "sparse":
            wh = np.asarray(params.gru_a.wh)
            blocks = wh.reshape(wh.shape[0] // 64, 64,
                                wh.shape[1] // 64, 64)
            live = (np.abs(blocks).sum((1, 3)) > 0).mean()
            print(f"sparse: live block fraction {live:.3f}", flush=True)
            assert live < 0.35, live
            pattern = derive_block_pattern(params.gru_a.wh, (64, 64))
        y = np.asarray(pallas_generate(
            params, jnp.asarray(arrs["feat"]),
            jnp.asarray(arrs["periods"]), jnp.asarray(arrs["lpc"]),
            jax.random.PRNGKey(0), gru_a_pattern=pattern))
        truth = deemphasis(arrs["x"])
        lsd = log_spectral_distance(truth[0], y[0])
        slsd = stft_log_spectral_distance(truth[0], y[0])
        print(f"{name}: Bark-LSD {lsd:.3f}, STFT-LSD {slsd:.2f} dB",
              flush=True)
        results[name] = (ce, lsd, slsd)

    ce_d, lsd_d, slsd_d = results["dense"]
    ce_s, lsd_s, slsd_s = results["sparse"]
    assert lsd_s < lsd_d * 1.25 + 0.1, (
        f"sparse quality off: {lsd_s} vs dense {lsd_d}")
    print(f"SPARSE VALIDATION PASSED (dense LSD {lsd_d:.3f} vs "
          f"sparse {lsd_s:.3f})", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 150)
