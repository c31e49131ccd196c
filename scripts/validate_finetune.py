"""Coded-feature vocoder finetune validation (the reference's actual
deployment recipe: external `train_lpcnet.py <model> --quantize`,
README.md:30-40, = our train_lpcnet `data_dir=` path).

Pipeline on speech-realistic fixtures, all real-TPU training:
  1. train predictor + codebooks, encode the train set
     (generate_qtz_features) -> coded feature windows,
  2. train a vocoder on CLEAN features,
  3. finetune a copy on the CODED features (what the decoder will
     actually receive),
  4. synthesise from coded features with both; the finetuned model
     must match or beat the clean-trained one under coded conditioning.

    python scripts/validate_finetune.py [pred_epochs] [voc_epochs]
"""
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(pred_epochs: int = 120, voc_epochs: int = 150):
    import jax
    import jax.numpy as jnp

    from fpsc_tpu.config.config import Config, apply_overrides
    from fpsc_tpu.data.dataset import build_dataset
    from fpsc_tpu.dsp import constants as C
    from fpsc_tpu.dsp.ceps2lpc import ceps2lpc
    from fpsc_tpu.dsp.emphasis import deemphasis
    from fpsc_tpu.eval.metrics import (log_spectral_distance,
                                       stft_log_spectral_distance)
    from fpsc_tpu.ops.lpcnet_sampler import pallas_generate
    from fpsc_tpu.train import generate_qtz_features, train_cb
    from fpsc_tpu.train import train_frame, train_lpcnet

    label = time.strftime("ft_%m%d_%H%M%S")
    save = "/tmp/fpsc_finetune"
    data = [
        "data.synthetic=true", "data.synthetic_style=speech",
        "data.synthetic_utterances=24", "data.chunks=4",
        "data.batch_size=8",
    ]
    base = data + [
        "predictor.gru_units1=384", "predictor.gru_units2=128",
        f"train.epochs={pred_epochs}", "train.learning_rate=0.001",
        "train.warmup_batches=10",
        f"train.save_dir={save}", "train.save_every=50",
        "codec.vq_entries=256,128", "codec.vq_entries_bl=128",
        "codec.scl_entries=64", "codec.scl_entries_bl=16",
        f"codec.codebook_path={save}/cb.npz",
    ]
    cfg = Config(label=label)
    apply_overrides(cfg, base)
    print("=== 1. predictor + codebooks + encode ===", flush=True)
    train_frame.run(cfg)
    cfg_cb = Config(label=label)
    apply_overrides(cfg_cb, base + [
        f"train.transfer_model={label}",
        f"train.transfer_epoch={pred_epochs - 1}",
        "train.debugging=true"])
    train_cb.run(cfg_cb)
    out = generate_qtz_features.run(cfg_cb, max_utterances=24,
                                    out_dir=f"{save}/qtz")
    print(f"encode: MSE {out['mse']:.6f}, "
          f"{out['bitrate_rc']:.0f} b/s entropy-coded", flush=True)

    print("=== 2. clean-trained vocoder ===", flush=True)
    cfg_v = Config(label=label + "_clean")
    apply_overrides(cfg_v, data + [
        "train.learning_rate=0.001", f"train.epochs={voc_epochs}",
        f"train.save_dir={save}", "train.save_every=100",
    ])
    clean_params, ce_c = train_lpcnet.run(cfg_v)
    print(f"clean CE {ce_c:.3f}", flush=True)

    print("=== 3. coded-feature finetune ===", flush=True)
    cfg_f = Config(label=label + "_ft")
    apply_overrides(cfg_f, data + [
        "train.learning_rate=0.0005",
        f"train.epochs={max(voc_epochs // 2, 50)}",
        f"train.save_dir={save}", "train.save_every=100",
    ])
    ft_params, ce_f = train_lpcnet.run(cfg_f, data_dir=f"{save}/qtz",
                                       init_params=clean_params)
    print(f"finetuned CE {ce_f:.3f}", flush=True)

    print("=== 4. synthesis from CODED features ===", flush=True)
    # encode a held-out utterance and decode-side features
    from fpsc_tpu.codec.codec import encode
    from fpsc_tpu.data.dataset import predictor_inputs
    from fpsc_tpu.train import checkpoint as ckpt
    from fpsc_tpu.train.train_frame import build_model
    frame_params = build_model(cfg_cb, jax.random.PRNGKey(cfg.train.seed))
    payload = ckpt.load(ckpt.checkpoint_path(save, label,
                                             pred_epochs - 1))
    frame_params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(frame_params),
        [jnp.asarray(v) for v in
         jax.tree_util.tree_leaves(payload["params"])])
    books = ckpt.load_codebooks(f"{save}/cb.npz")

    ds = build_dataset(cfg.data, "val")
    batch = next(ds.iter_batches(2, seed=0))
    feat = jnp.asarray(predictor_inputs(batch, True))
    enc = encode(frame_params, books, feat)
    coded = np.asarray(enc["coded"])
    coded_un = coded * C.MAXI
    periods = (0.1 + 50.0 * coded_un[..., 18] + 100.0).astype(np.int32)
    _, lpc, _ = ceps2lpc(jnp.asarray(coded_un.reshape(-1, 20)[:, :18]))
    lpc = np.asarray(lpc).reshape(coded.shape[0], -1, 16)

    truth = deemphasis(batch["x"])
    results = {}
    for name, p in (("clean-trained", clean_params),
                    ("coded-finetuned", ft_params)):
        y = np.asarray(pallas_generate(
            p, jnp.asarray(coded), jnp.asarray(periods),
            jnp.asarray(lpc), jax.random.PRNGKey(0),
            corr=jnp.asarray(coded_un[..., 19])))
        lsd = log_spectral_distance(truth[0], y[0])
        slsd = stft_log_spectral_distance(truth[0], y[0])
        print(f"{name}: Bark-LSD {lsd:.3f}, STFT-LSD {slsd:.2f} dB "
              f"(driving the vocoder with CODED features)", flush=True)
        results[name] = lsd
    assert results["coded-finetuned"] < results["clean-trained"] * 1.1, (
        results)
    print("FINETUNE VALIDATION PASSED", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 120,
         int(sys.argv[2]) if len(sys.argv) > 2 else 150)
