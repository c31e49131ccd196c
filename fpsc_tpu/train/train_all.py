"""Joint frame + sample training entry point.

Capability parity with reference src/train_all.py: a FROZEN frame
predictor produces coded features in-loop (closed-loop encode ->
decode, train_all.py:126-131), pitch periods come from the predicted
pitch track via the reference formula (.1 + 50*f18 + 100,
train_all.py:136), and the WaveNet vocoder trains on those coded
features.  Checkpoints save the (frame, sample) model pair
(utils.py:142-144 semantics via paired files).

Run:  python -m fpsc_tpu.train.train_all data.synthetic=true \
          train.epochs=1 train.debugging=true
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fpsc_tpu.config.config import Config, parse_cli
from fpsc_tpu.data.dataset import build_dataset
from fpsc_tpu.dsp import constants as C
from fpsc_tpu.models import frame_predictor as fp
from fpsc_tpu.parallel import mesh as meshlib
from fpsc_tpu.train import checkpoint as ckpt
from fpsc_tpu.train.train_frame import build_model as build_frame
from fpsc_tpu.train.train_lpcnet import vocoder_inputs
from fpsc_tpu.train.train_vocoder import (build_optimizer, loss_fn,
                                          model_config)
from fpsc_tpu.models import wavenet as wn


def coded_features(frame_params, feat, l1, l2):
    """Closed-loop encode (no quantisers, threshold masking) ->
    un-normalised coded features, as the in-loop coded conditioning."""
    out = fp.encoder(frame_params, feat, l1=l1, l2=l2, qtz=False)
    return out["c_in"] * C.MAXI


def run(cfg: Config):
    mesh = meshlib.make_mesh()
    frame_params = build_frame(cfg, jax.random.PRNGKey(cfg.train.seed))
    if cfg.train.transfer_model:
        payload = ckpt.load(ckpt.checkpoint_path(
            cfg.train.save_dir, cfg.train.transfer_model,
            cfg.train.transfer_epoch))
        frame_params = ckpt.restore_params(
            frame_params, payload, "predictor")

    mcfg = model_config(cfg)
    sample_params = wn.init_wavenet(
        jax.random.PRNGKey(cfg.train.seed + 1), mcfg)
    tx = build_optimizer(cfg, sample_params)
    opt_state = tx.init(sample_params)
    sample_params = meshlib.replicate(mesh, sample_params)

    ds = build_dataset(cfg.data, "train")
    l1, l2 = cfg.codec.l1, cfg.codec.l2
    inp_ch = cfg.wavenet.inp_channels

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def train_step(frame_params, sample_params, opt_state,
                   nm_feat, x, lpc):
        coded = coded_features(frame_params, nm_feat, l1, l2)
        periods = (0.1 + 50.0 * coded[..., 18] + 100.0).astype(jnp.int32)

        def vocoder_loss(sp):
            return loss_fn(sp, mcfg, coded[..., :20] / C.MAXI, periods,
                           x, lpc, inp_ch)
        loss, grads = jax.value_and_grad(vocoder_loss)(sample_params)
        updates, opt_state = tx.update(grads, opt_state, sample_params)
        return optax.apply_updates(sample_params, updates), opt_state, loss

    label = cfg.label
    min_loss = float("inf")
    for epoch in range(cfg.train.epochs):
        t0 = time.time()
        total, n = 0.0, 0
        for batch in ds.iter_batches(cfg.data.batch_size,
                                     seed=cfg.train.seed + epoch):
            arrs = vocoder_inputs(batch, cfg.data.normalize)
            nm_feat = batch["nm_feat"][
                :, C.CONTEXT_FRAMES:-C.CONTEXT_FRAMES,
                :C.NB_USED_FEATURES].astype(np.float32)
            nm_feat, x, lpc = (meshlib.shard_batch(mesh, a) for a in (
                nm_feat, arrs["x"], arrs["lpc"]))
            sample_params, opt_state, loss = train_step(
                frame_params, sample_params, opt_state, nm_feat, x, lpc)
            total += float(loss)
            n += 1
            if cfg.train.debugging or (
                    cfg.train.steps_per_epoch
                    and n >= cfg.train.steps_per_epoch):
                break
        ckpt.log_epoch(cfg.train.save_dir, label, epoch,
                       time.time() - t0, total / max(n, 1), 0.0,
                       cfg.train.debugging)
        should_save = (epoch % max(cfg.train.save_every, 1) == 0
                       or epoch == cfg.train.epochs - 1)
        if not cfg.train.debugging and should_save:
            # save the (frame, sample) pair
            ckpt.save(ckpt.checkpoint_path(cfg.train.save_dir,
                                           label + "_f", epoch),
                      frame_params, None, step=epoch)
            ckpt.save(ckpt.checkpoint_path(cfg.train.save_dir,
                                           label + "_s", epoch),
                      sample_params, opt_state, step=epoch)
        min_loss = min(min_loss, total / max(n, 1))
    return frame_params, sample_params, min_loss


if __name__ == "__main__":
    run(parse_cli())
