"""WaveNet-family validation with REAL training: train the WaveNet
vocoder on synthetic fixtures and check ring-buffer AR synthesis tracks
the target spectrally.

    python scripts/validate_wavenet.py [epochs]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(epochs: int = 120):
    import jax
    import jax.numpy as jnp

    from fpsc_tpu.config.config import Config, apply_overrides
    from fpsc_tpu.data.dataset import build_dataset
    from fpsc_tpu.dsp import constants as C
    from fpsc_tpu.eval.metrics import log_spectral_distance
    from fpsc_tpu.models import wavenet as wn
    from fpsc_tpu.train import train_vocoder
    from fpsc_tpu.train.train_lpcnet import vocoder_inputs

    label = time.strftime("wn_%m%d_%H%M%S")
    overrides = [
        "data.synthetic=true", "data.synthetic_utterances=24",
        "data.chunks=4", "data.batch_size=8",
        # mid-size net for a fast validation run
        "wavenet.num_blocks=1", "wavenet.num_layers=8",
        "wavenet.residual_channels=64", "wavenet.gate_channels=128",
        "wavenet.skip_channels=64", "wavenet.cout_channels=64",
        "train.learning_rate=0.001", f"train.epochs={epochs}",
        "train.save_dir=/tmp/fpsc_wn", "train.save_every=50",
    ]
    cfg = Config(label=label)
    apply_overrides(cfg, overrides)

    t0 = time.time()
    params, loss = train_vocoder.run(cfg)
    print(f"trained {epochs} epochs in {time.time()-t0:.0f}s, "
          f"final NLL {loss:.3f}", flush=True)
    assert loss < -1.0, f"WaveNet failed to learn: NLL {loss}"

    mcfg = train_vocoder.model_config(cfg)
    ds = build_dataset(cfg.data, "val")
    batch = next(ds.iter_batches(2, seed=0))
    arrs = vocoder_inputs(batch)
    lpc_sample = np.repeat(arrs["lpc"], C.FRAME_SIZE, axis=1)
    y = np.asarray(wn.generate_lpc(
        params, mcfg, jax.random.PRNGKey(0),
        jnp.asarray(np.swapaxes(arrs["feat"], 1, 2)),
        jnp.asarray(arrs["periods"]), jnp.asarray(lpc_sample)))
    from fpsc_tpu.dsp.emphasis import deemphasis
    truth = deemphasis(arrs["x"])   # back to the listening domain
    lsd = log_spectral_distance(truth[0], y[0])
    noise = np.random.RandomState(0).randn(len(truth[0])).astype(
        np.float32) * truth[0].std()
    lsd_noise = log_spectral_distance(truth[0], noise)
    print(f"WaveNet AR synthesis: LSD {lsd:.3f} "
          f"(noise floor {lsd_noise:.3f})", flush=True)
    assert np.isfinite(y).all()
    assert lsd < 0.85 * lsd_noise
    print("WAVENET VALIDATION PASSED", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 120)
