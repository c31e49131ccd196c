"""Vocoder validation with REAL training: train the LPCNet vocoder on
synthetic fixtures, synthesise from held-out features with BOTH
samplers, and check the generated audio tracks the target spectrally.

    python scripts/validate_vocoder.py [epochs]
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
    from fpsc_tpu.eval.metrics import (log_spectral_distance,
                                       segmental_snr,
                                       stft_log_spectral_distance)
    from fpsc_tpu.models import lpcnet
    from fpsc_tpu.ops.lpcnet_sampler import pallas_generate
    from fpsc_tpu.train import train_lpcnet
    from fpsc_tpu.train.train_lpcnet import vocoder_inputs

    label = time.strftime("voc_%m%d_%H%M%S")
    overrides = [
        "data.synthetic=true", "data.synthetic_utterances=24",
        "data.chunks=4", "data.batch_size=8",
        "train.learning_rate=0.001", f"train.epochs={epochs}",
        "train.save_dir=/tmp/fpsc_voc", "train.save_every=50",
    ]
    cfg = Config(label=label)
    apply_overrides(cfg, overrides)

    t0 = time.time()
    params, loss = train_lpcnet.run(cfg)
    print(f"trained {epochs} epochs in {time.time()-t0:.0f}s, "
          f"final CE {loss:.3f} nats (untrained ~{np.log(256):.2f})",
          flush=True)
    # untrained CE is log(256)=5.55 nats; a short run on tiny data
    # lands ~3.5 and is still descending - assert clear learning.
    assert loss < 4.2, f"vocoder failed to learn: CE {loss}"

    # synthesise a held-out utterance from ground-truth features
    ds = build_dataset(cfg.data, "val")
    batch = next(ds.iter_batches(2, seed=0))
    arrs = vocoder_inputs(batch)
    feat = jnp.asarray(arrs["feat"])
    periods = jnp.asarray(arrs["periods"])
    lpc = jnp.asarray(arrs["lpc"])
    y_pallas = np.asarray(pallas_generate(
        params, feat, periods, lpc, jax.random.PRNGKey(0)))
    y_xla = np.asarray(lpcnet.generate(
        params, feat, periods, lpc, jax.random.PRNGKey(0)))

    # dataset waveforms are in the pre-emphasis domain; generated
    # audio is de-emphasised - compare in the listening domain
    from fpsc_tpu.dsp.emphasis import deemphasis
    truth = deemphasis(arrs["x"])
    noise = np.random.RandomState(0).randn(
        len(truth[0])).astype(np.float32) * truth[0].std()
    from fpsc_tpu.eval.stoi import stoi
    for name, y in (("pallas", y_pallas), ("xla", y_xla)):
        lsd = log_spectral_distance(truth[0], y[0])
        lsd_noise = log_spectral_distance(truth[0], noise)
        slsd = stft_log_spectral_distance(truth[0], y[0])
        slsd_noise = stft_log_spectral_distance(truth[0], noise)
        try:
            st = stoi(truth[0], y[0])
            st_noise = stoi(truth[0], noise)
            st_msg = f"; STOI {st:.3f} (noise {st_noise:.3f})"
        except ValueError:      # fixture too short for 384 ms segments
            st_msg = ""
        print(f"{name}: Bark-LSD {lsd:.3f} (noise {lsd_noise:.3f}); "
              f"STFT-LSD {slsd:.2f} dB (noise {slsd_noise:.2f} dB)"
              f"{st_msg}", flush=True)
        assert np.isfinite(y).all()
        assert lsd < 0.8 * lsd_noise, (
            f"{name} synthesis no better than noise: {lsd} vs {lsd_noise}")
        assert slsd < 0.8 * slsd_noise, (
            f"{name} STFT-LSD no better than noise: {slsd} vs {slsd_noise}")
    print("VOCODER VALIDATION PASSED", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 150)
