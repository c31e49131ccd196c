"""Joint frame+sample training validation with REAL training
(reference src/train_all.py capability: a frozen trained predictor
produces coded features in-loop and the WaveNet vocoder trains on
them, with pitch periods derived from the predicted track).

Trains a predictor, then runs train_all for the vocoder, then
synthesises from in-loop coded features and checks the audio beats the
noise floor.

    python scripts/validate_train_all.py [pred_epochs] [voc_epochs]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(pred_epochs: int = 100, voc_epochs: int = 120):
    import jax
    import jax.numpy as jnp

    from fpsc_tpu.config.config import Config, apply_overrides
    from fpsc_tpu.data.dataset import build_dataset
    from fpsc_tpu.dsp import constants as C
    from fpsc_tpu.dsp.emphasis import deemphasis
    from fpsc_tpu.eval.metrics import (log_spectral_distance,
                                       stft_log_spectral_distance)
    from fpsc_tpu.models import wavenet as wn
    from fpsc_tpu.train import train_all, train_frame
    from fpsc_tpu.train.train_lpcnet import vocoder_inputs
    from fpsc_tpu.train.train_vocoder import model_config

    label = time.strftime("ta_%m%d_%H%M%S")
    save = "/tmp/fpsc_train_all"
    # harmonic fixtures: what's under test is train_all's mechanism
    # (frozen predictor -> in-loop coded conditioning -> WaveNet), not
    # WaveNet capacity; the mid-size WaveNet is known-good on these
    # (validate_wavenet) while speech fixtures need a larger model
    data = [
        "data.synthetic=true",
        "data.synthetic_utterances=16", "data.chunks=4",
        "data.batch_size=8",
    ]
    pred = data + [
        "predictor.gru_units1=384", "predictor.gru_units2=128",
        f"train.epochs={pred_epochs}", "train.learning_rate=0.001",
        "train.warmup_batches=10",
        f"train.save_dir={save}", "train.save_every=50",
    ]
    cfg = Config(label=label)
    apply_overrides(cfg, pred)
    print("=== 1. train_frame ===", flush=True)
    train_frame.run(cfg)

    print("=== 2. train_all (frozen predictor -> WaveNet) ===",
          flush=True)
    cfg_ta = Config(label=label + "_joint")
    apply_overrides(cfg_ta, data + [
        "wavenet.num_blocks=1", "wavenet.num_layers=8",
        "wavenet.residual_channels=64", "wavenet.gate_channels=128",
        "wavenet.skip_channels=64", "wavenet.cout_channels=64",
        "train.learning_rate=0.001", f"train.epochs={voc_epochs}",
        f"train.save_dir={save}", "train.save_every=100",
        f"train.transfer_model={label}",
        f"train.transfer_epoch={pred_epochs - 1}",
    ])
    t0 = time.time()
    frame_params, sample_params, nll = train_all.run(cfg_ta)
    print(f"joint vocoder {voc_epochs} epochs in {time.time()-t0:.0f}s, "
          f"NLL {nll:.3f}", flush=True)
    assert nll < -0.5, f"joint vocoder failed to learn: {nll}"

    print("=== 3. synthesis from in-loop coded features ===", flush=True)
    mcfg = model_config(cfg_ta)
    ds = build_dataset(cfg_ta.data, "val")
    batch = next(ds.iter_batches(2, seed=0))
    arrs = vocoder_inputs(batch)
    nm_feat = batch["nm_feat"][:, C.CONTEXT_FRAMES:-C.CONTEXT_FRAMES,
                               :C.NB_USED_FEATURES].astype(np.float32)
    coded = np.asarray(train_all.coded_features(
        frame_params, jnp.asarray(nm_feat), cfg_ta.codec.l1,
        cfg_ta.codec.l2))
    periods = (0.1 + 50.0 * coded[..., 18] + 100.0).astype(np.int32)
    # LPC from the dataset, exactly as trained (reference train_all
    # semantics: periods from the predicted track, LPC from the batch)
    lpc_sample = np.repeat(arrs["lpc"], C.FRAME_SIZE, axis=1)
    y = np.asarray(wn.generate_lpc(
        sample_params, mcfg, jax.random.PRNGKey(0),
        jnp.asarray(np.swapaxes(coded[..., :20] / C.MAXI, 1, 2)),
        jnp.asarray(periods), jnp.asarray(lpc_sample)))
    truth = deemphasis(arrs["x"])
    noise = np.random.RandomState(0).randn(
        len(truth[0])).astype(np.float32) * truth[0].std()
    lsd = log_spectral_distance(truth[0], y[0])
    lsd_n = log_spectral_distance(truth[0], noise)
    slsd = stft_log_spectral_distance(truth[0], y[0])
    slsd_n = stft_log_spectral_distance(truth[0], noise)
    print(f"coded-conditioned WaveNet: Bark-LSD {lsd:.3f} "
          f"(noise {lsd_n:.3f}); STFT-LSD {slsd:.2f} dB "
          f"(noise {slsd_n:.2f} dB)", flush=True)
    assert np.isfinite(y).all()
    assert lsd < 0.85 * lsd_n and slsd < 0.85 * slsd_n
    print("TRAIN_ALL VALIDATION PASSED", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100,
         int(sys.argv[2]) if len(sys.argv) > 2 else 120)
