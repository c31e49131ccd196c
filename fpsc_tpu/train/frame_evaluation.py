"""Open-loop predictor evaluation entry point.

Capability parity with reference src/frame_evaluation.py: over the
validation set, compute 128-bin histogram entropies of (a) ground-truth
frames, (b) predictions, (c) adjacent-frame deltas (truth and
predicted), and (d) the prediction residual - demonstrating the paper's
claim that the predictor residual has lower entropy than frame deltas
(frame_evaluation.py:130-181).

Run:  python -m fpsc_tpu.train.frame_evaluation data.synthetic=true
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from fpsc_tpu.config.config import Config, parse_cli
from fpsc_tpu.data.dataset import build_dataset, predictor_inputs
from fpsc_tpu.dsp.entropy import histogram_entropy
from fpsc_tpu.models import frame_predictor as fp
from fpsc_tpu.train import checkpoint as ckpt
from fpsc_tpu.train.train_frame import build_model


def run(cfg: Config, max_batches: int = 50):
    params = build_model(cfg, jax.random.PRNGKey(cfg.train.seed))
    if cfg.train.transfer_model:
        payload = ckpt.load(ckpt.checkpoint_path(
            cfg.train.save_dir, cfg.train.transfer_model,
            cfg.train.transfer_epoch))
        params = ckpt.restore_params(params, payload, "predictor")

    ds = build_dataset(cfg.data, "val")
    fwd = jax.jit(lambda p, f: fp.forward(p, f)[0])
    rows = []
    for i, batch in enumerate(ds.iter_batches(
            min(cfg.data.batch_size, len(ds)), seed=0)):
        if i >= max_batches:
            break
        feat = jnp.asarray(predictor_inputs(batch, cfg.data.normalize))
        out = np.asarray(fwd(params, feat))          # predicts t+1
        truth = np.asarray(feat)[:, :, :18]
        frames = truth[:, 1:, :]
        frames_out = out[:, :-1, :]
        adj_res_tr = frames - truth[:, :-1, :]
        adj_res_out = frames_out - truth[:, :-1, :]
        res = frames - frames_out
        rows.append([
            histogram_entropy(frames),
            histogram_entropy(frames_out),
            histogram_entropy(adj_res_tr),
            histogram_entropy(adj_res_out),
            histogram_entropy(res),
        ])
    avg = np.mean(np.asarray(rows), axis=0)
    report = {
        "spec": round(float(avg[0]), 4),
        "spec_out": round(float(avg[1]), 4),
        "adj_res_tr": round(float(avg[2]), 4),
        "adj_res_out": round(float(avg[3]), 4),
        "residual": round(float(avg[4]), 4),
    }
    for k, v in report.items():
        print(k, v)
    if not cfg.train.debugging:
        out_dir = os.path.join(cfg.train.save_dir,
                               f"samples_{cfg.label}")
        os.makedirs(out_dir, exist_ok=True)
        np.save(os.path.join(out_dir, "eval_result.npy"),
                np.asarray(rows))
    return report


if __name__ == "__main__":
    run(parse_cli())
