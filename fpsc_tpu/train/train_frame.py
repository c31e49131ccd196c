"""Feature-predictor training entry point.

Capability parity with reference src/train_frame.py: per epoch the
first `warmup_batches` run teacher-forced full-sequence MSE
(train_frame.py:77-79), later batches train the learned-mask
closed-loop path with the keep-rate penalty while the mask sharpness
`scale` anneals by +5 per batch up to 100 (train_frame.py:62-83).

TPU-native: both train steps are single jitted programs; batches are
device_put with their batch axis sharded over the mesh 'data' axis
(pure DP - gradients reduce via XLA-inserted collectives).

Run:  python -m fpsc_tpu.train.train_frame data.synthetic=true \
          train.epochs=2 train.debugging=true
"""
from __future__ import annotations

import functools
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from fpsc_tpu.config.config import Config, parse_cli
from fpsc_tpu.data.dataset import build_dataset, predictor_inputs
from fpsc_tpu.models import frame_predictor as fp
from fpsc_tpu.parallel import mesh as meshlib
from fpsc_tpu.train import checkpoint as ckpt
from fpsc_tpu.utils import diagnostics


def build_model(cfg: Config, key: jax.Array):
    mcfg = fp.FramePredictorConfig(
        in_features=cfg.predictor.in_features,
        gru_units1=cfg.predictor.gru_units1,
        gru_units2=cfg.predictor.gru_units2,
        fc_units=cfg.predictor.fc_units,
        mask_units=cfg.predictor.mask_units,
    )
    return fp.init_frame_predictor(key, mcfg)


def warmup_loss(params, feat):
    """Teacher-forced next-frame MSE (train_frame.py:79)."""
    out, _, _ = fp.forward(params, feat)
    return jnp.mean(jnp.square(out[:, :-1, :] - feat[:, 1:, :fp.NB_CEPS]))


def mask_loss(params, feat, scale, keep_rate):
    """Closed-loop masked MSE + keep-rate penalties (train_frame.py:83)."""
    out = fp.mask_enc(params, feat, scale=scale, qtz=False)
    mse = jnp.mean(jnp.square(out["c_in"][:, :-1, :fp.NB_CEPS]
                              - feat[:, 1:, :fp.NB_CEPS]))
    pen = (jnp.square(jnp.mean(out["scl_mask"]) - keep_rate)
           + jnp.square(jnp.mean(out["vct_mask"]) - keep_rate))
    return mse + pen


def make_steps(tx):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def warm_step(params, opt_state, feat):
        loss, grads = jax.value_and_grad(warmup_loss)(params, feat)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def mask_step(params, opt_state, feat, scale, keep_rate):
        loss, grads = jax.value_and_grad(mask_loss)(
            params, feat, scale, keep_rate)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_warm(params, feat):
        return warmup_loss(params, feat)

    @jax.jit
    def eval_mask(params, feat, scale, keep_rate):
        return mask_loss(params, feat, scale, keep_rate)

    return warm_step, mask_step, eval_warm, eval_mask


def run(cfg: Config) -> Tuple[fp.FramePredictorParams, float]:
    mesh = meshlib.make_mesh()
    key = jax.random.PRNGKey(cfg.train.seed)
    params = build_model(cfg, key)

    tx = optax.adam(cfg.train.learning_rate)
    opt_state = tx.init(params)

    if cfg.train.transfer_model:
        path = ckpt.checkpoint_path(cfg.train.save_dir,
                                    cfg.train.transfer_model,
                                    cfg.train.transfer_epoch)
        payload = ckpt.load(path)
        params = ckpt.restore_params(params, payload, "predictor")
        print(f"Loaded transfer checkpoint: {path}")

    params = meshlib.replicate(mesh, params)
    opt_state = meshlib.replicate(mesh, opt_state)

    train_ds = build_dataset(cfg.data, "train")
    val_ds = build_dataset(cfg.data, "val")
    warm_step, mask_step, eval_warm, eval_mask = make_steps(tx)

    scale = 1.0
    min_loss = float("inf")
    label = cfg.label
    save_dir = cfg.train.save_dir

    for epoch in range(cfg.train.epochs):
        t0 = time.time()
        train_loss = 0.0
        n_batches = 0
        for batch_idx, batch in enumerate(
                train_ds.iter_batches(cfg.data.batch_size,
                                      seed=cfg.train.seed + epoch)):
            feat = meshlib.shard_batch(
                mesh, predictor_inputs(batch, cfg.data.normalize))
            if batch_idx > cfg.train.warmup_batches and \
                    scale < cfg.train.scale_max:
                scale += cfg.train.scale_step
            if batch_idx <= cfg.train.warmup_batches:
                params, opt_state, loss = warm_step(params, opt_state, feat)
            else:
                params, opt_state, loss = mask_step(
                    params, opt_state, feat, jnp.float32(scale),
                    cfg.train.keep_rate)
            train_loss += float(loss)
            n_batches += 1
            if cfg.train.debugging:
                break
            if cfg.train.steps_per_epoch and \
                    n_batches >= cfg.train.steps_per_epoch:
                break

        # evaluation
        val_loss = 0.0
        n_val = 0
        for batch_idx, batch in enumerate(
                val_ds.iter_batches(min(cfg.data.batch_size, len(val_ds)),
                                    seed=1234)):
            feat = meshlib.shard_batch(
                mesh, predictor_inputs(batch, cfg.data.normalize))
            if batch_idx <= cfg.train.warmup_batches:
                val_loss += float(eval_warm(params, feat))
            else:
                val_loss += float(eval_mask(params, feat,
                                            jnp.float32(scale),
                                            cfg.train.keep_rate))
            n_val += 1
            if cfg.train.debugging or n_val >= cfg.data.num_eval_batches:
                break

        duration = time.time() - t0
        ckpt.log_epoch(save_dir, label, epoch, duration, train_loss,
                       val_loss, cfg.train.debugging)
        if diagnostics.should_plot(cfg.train.plot_every, epoch):
            # reference inspection ergonomics (train_frame.py:95-114):
            # target vs coded-feature heatmaps for one val utterance
            import numpy as np
            out = fp.encoder(params, feat[:1], l1=0.09, l2=0.28,
                             qtz=False)
            diagnostics.save_feature_heatmap(
                save_dir, label, epoch,
                np.asarray(feat)[0, :, :18],
                np.asarray(out["c_in"])[0, :, :18])
        should_save = (epoch % max(cfg.train.save_every, 1) == 0
                       or epoch == cfg.train.epochs - 1)
        if not cfg.train.debugging and should_save:
            ckpt.save(ckpt.checkpoint_path(save_dir, label, epoch),
                      params, opt_state, step=epoch,
                      extra={"scale": scale})
        min_loss = min(min_loss, val_loss)

    return params, min_loss


if __name__ == "__main__":
    cfg = parse_cli()
    print(f"model label: {cfg.label}")
    run(cfg)
