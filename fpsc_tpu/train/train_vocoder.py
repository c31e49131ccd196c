"""WaveNet vocoder training entry point.

Capability parity with reference src/train.py: Gaussian NLL on the
next-sample LPC excitation (exc = x - roll(pred, 1), train.py:125-139),
grad-clip 10, optional transfer checkpoint and `upd_f_only` freezing of
the WaveNet core (conditioning-only finetune, train.py:259-265), and
training on coded features via `data_dir=` (the Libri_lpc_data_retrain
path).

Run:  python -m fpsc_tpu.train.train_vocoder data.synthetic=true \
          train.epochs=1 train.debugging=true
"""
from __future__ import annotations

import functools
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from fpsc_tpu.config.config import Config, parse_cli
from fpsc_tpu.data.dataset import build_dataset
from fpsc_tpu.dsp.gaussian import gaussian_nll
from fpsc_tpu.dsp.lpc import lpc_pred
from fpsc_tpu.models import wavenet as wn
from fpsc_tpu.parallel import mesh as meshlib
from fpsc_tpu.train import checkpoint as ckpt
from fpsc_tpu.train.train_lpcnet import coded_dataset, vocoder_inputs


def model_config(cfg: Config) -> wn.WavenetConfig:
    return wn.WavenetConfig(
        out_channels=cfg.wavenet.out_channels,
        num_blocks=cfg.wavenet.num_blocks,
        num_layers=cfg.wavenet.num_layers,
        inp_channels=cfg.wavenet.inp_channels,
        residual_channels=cfg.wavenet.residual_channels,
        gate_channels=cfg.wavenet.gate_channels,
        skip_channels=cfg.wavenet.skip_channels,
        kernel_size=cfg.wavenet.kernel_size,
        cin_channels=cfg.wavenet.cin_channels,
        cout_channels=cfg.wavenet.cout_channels,
        front_kernel=cfg.wavenet.front_kernel,
        fat_upsampler=cfg.wavenet.fat_upsampler,
        local=cfg.wavenet.local,
        upsample_scales=tuple(cfg.wavenet.upsample_scales),
    )


def loss_fn(params, mcfg: wn.WavenetConfig, feat, periods, x, lpc,
            inp_channels: int = 1):
    """Teacher-forced Gaussian NLL on next-sample excitation."""
    pred = lpc_pred(x, lpc)
    exc = x - jnp.roll(pred, 1, axis=-1)
    if inp_channels == 3:
        inp = jnp.stack([x, exc, pred], axis=1)
    else:
        inp = x[:, None, :]
    dist = wn.forward(params, mcfg, inp, periods,
                      jnp.swapaxes(feat, 1, 2))     # (B, 2, T)
    dist = jnp.moveaxis(dist, 1, -1)                # (B, T, 2)
    return gaussian_nll(dist[:, :-1, :], exc[:, 1:])


def build_optimizer(cfg: Config, params: wn.WavenetParams):
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.adam(cfg.train.learning_rate),
    )
    if cfg.train.upd_f_only:
        # freeze the WaveNet core; tune only the upsampler/conditioning
        frozen = {"front", "blocks", "final1", "final2"}
        labels = wn.WavenetParams(*[
            jax.tree_util.tree_map(
                lambda _: "freeze" if name in frozen else "train", sub)
            for name, sub in zip(wn.WavenetParams._fields, params)])
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx


def run(cfg: Config, data_dir: Optional[str] = None
        ) -> Tuple[wn.WavenetParams, float]:
    mesh = meshlib.make_mesh()
    mcfg = model_config(cfg)
    params = wn.init_wavenet(jax.random.PRNGKey(cfg.train.seed), mcfg)
    if cfg.train.transfer_model:
        payload = ckpt.load(ckpt.checkpoint_path(
            cfg.train.save_dir, cfg.train.transfer_model,
            cfg.train.transfer_epoch))
        params = ckpt.restore_params(params, payload, "vocoder")
        print("loaded transfer vocoder checkpoint")
    tx = build_optimizer(cfg, params)
    opt_state = tx.init(params)
    params = meshlib.replicate(mesh, params)

    train_ds = build_dataset(cfg.data, "train")
    if data_dir:
        train_ds = coded_dataset(data_dir, train_ds)
        print(f"training on coded features from {data_dir}")

    inp_ch = cfg.wavenet.inp_channels

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, feat, periods, x, lpc):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, mcfg, feat, periods, x, lpc, inp_ch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    label = cfg.label + "_s"
    min_loss = float("inf")
    for epoch in range(cfg.train.epochs):
        t0 = time.time()
        total, n = 0.0, 0
        for batch in train_ds.iter_batches(cfg.data.batch_size,
                                           seed=cfg.train.seed + epoch):
            arrs = meshlib.shard_batch(
                mesh, vocoder_inputs(batch, cfg.data.normalize))
            params, opt_state, loss = train_step(
                params, opt_state, arrs["feat"], arrs["periods"],
                arrs["x"], arrs["lpc"])
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
            ckpt.save(ckpt.checkpoint_path(cfg.train.save_dir, label,
                                           epoch),
                      params, opt_state, step=epoch)
        min_loss = min(min_loss, total / max(n, 1))
    return params, min_loss


if __name__ == "__main__":
    run(parse_cli())
