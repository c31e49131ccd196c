"""IAF parallel-student validation with REAL training.

Trains the Wavenet_IAF excitation student (reference src/train_iaf.py
capability: z -> excitation through stacked flows, STFT-magnitude MSE
+ Gaussian LL against the teacher-forced excitation) on the
speech-realistic fixtures, then synthesises: noise through the flows
gives excitation, the LPC synthesis IIR (dsp.lpc.lpc_synthesis)
reconstructs audio, and the result must beat the noise floor both on
excitation spectra and decoded audio.

    python scripts/validate_iaf.py [epochs]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(epochs: int = 200):
    import jax
    import jax.numpy as jnp

    from fpsc_tpu.config.config import Config, apply_overrides
    from fpsc_tpu.data.dataset import build_dataset
    from fpsc_tpu.dsp.emphasis import deemphasis
    from fpsc_tpu.dsp.lpc import excitation, lpc_synthesis
    from fpsc_tpu.eval.metrics import stft_log_spectral_distance
    from fpsc_tpu.models import wavenet as wn
    from fpsc_tpu.models import wavenet_iaf as iaf
    from fpsc_tpu.train import train_iaf
    from fpsc_tpu.train.train_lpcnet import vocoder_inputs
    from fpsc_tpu.train.train_vocoder import model_config

    label = time.strftime("iaf_%m%d_%H%M%S")
    overrides = [
        "data.synthetic=true", "data.synthetic_style=speech",
        "data.synthetic_utterances=16", "data.chunks=4",
        "data.batch_size=8",
        "iaf.num_flows=4", "iaf.num_layers=6",
        "iaf.residual_channels=32", "iaf.gate_channels=64",
        "iaf.skip_channels=32", "iaf.cout_channels=32",
        "wavenet.cout_channels=32",
        "train.learning_rate=0.0005", f"train.epochs={epochs}",
        "train.save_dir=/tmp/fpsc_iaf", "train.save_every=100",
    ]
    cfg = Config(label=label)
    apply_overrides(cfg, overrides)

    t0 = time.time()
    params, min_loss = train_iaf.run(cfg)
    print(f"trained {epochs} epochs in {time.time()-t0:.0f}s, "
          f"min loss {min_loss:.3f}", flush=True)

    icfg = train_iaf.iaf_config(cfg)
    mcfg = model_config(cfg)
    teacher = wn.init_wavenet(jax.random.PRNGKey(cfg.train.seed + 9),
                              mcfg)

    ds = build_dataset(cfg.data, "val")
    batch = next(ds.iter_batches(2, seed=0))
    arrs = vocoder_inputs(batch)
    x = jnp.asarray(arrs["x"])
    lpc = jnp.asarray(arrs["lpc"])
    exc_true, _ = excitation(x, lpc)
    c_up = wn.upsample(teacher.upsampler, mcfg,
                       jnp.asarray(np.swapaxes(arrs["feat"], 1, 2)),
                       jnp.asarray(arrs["periods"]))
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 1, x.shape[1]))
    exc_hat = np.asarray(iaf.generate(params, icfg, z, c_up))[:, 0]

    # excitation-domain spectral match
    e_true = np.asarray(exc_true)
    noise_e = np.random.RandomState(0).randn(
        e_true.shape[1]).astype(np.float32) * e_true[0].std()
    slsd_e = stft_log_spectral_distance(e_true[0], exc_hat[0])
    slsd_e_n = stft_log_spectral_distance(e_true[0], noise_e)
    print(f"excitation STFT-LSD {slsd_e:.2f} dB "
          f"(noise floor {slsd_e_n:.2f} dB)", flush=True)

    # audio: excitation -> LPC synthesis IIR -> de-emphasis
    y = np.asarray(lpc_synthesis(jnp.asarray(exc_hat), lpc))
    y = deemphasis(y)
    truth = deemphasis(arrs["x"])
    noise = np.random.RandomState(0).randn(
        len(truth[0])).astype(np.float32) * truth[0].std()
    slsd = stft_log_spectral_distance(truth[0], y[0])
    slsd_n = stft_log_spectral_distance(truth[0], noise)
    print(f"decoded-audio STFT-LSD {slsd:.2f} dB "
          f"(noise floor {slsd_n:.2f} dB)", flush=True)
    assert np.isfinite(y).all()
    assert slsd_e < 0.9 * slsd_e_n, (slsd_e, slsd_e_n)
    assert slsd < 0.9 * slsd_n, (slsd, slsd_n)
    print("IAF VALIDATION PASSED", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
