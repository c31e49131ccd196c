"""WaveNet-IAF student training entry point.

Capability parity with reference src/train_iaf.py (with its config
drift fixed): the flow student models the LPC excitation; z ~ N(0,1)
passes through the flows and the loss is STFT-magnitude MSE between
generated and target excitation plus the Gaussian log-likelihood of
the target under the accumulated flow distribution
(train_iaf.py:123-144).  Conditioning is upsampled by a (frozen)
teacher WaveNet when `train.transfer_model` names one, else by the
student's own upsampler.

Run:  python -m fpsc_tpu.train.train_iaf data.synthetic=true \
          train.epochs=1 train.debugging=true
"""
from __future__ import annotations

import functools
import math
import time

import jax
import jax.numpy as jnp
import optax

from fpsc_tpu.config.config import Config, parse_cli
from fpsc_tpu.data.dataset import build_dataset
from fpsc_tpu.dsp.lpc import lpc_pred
from fpsc_tpu.dsp.stft import stft_mag
from fpsc_tpu.models import wavenet as wn
from fpsc_tpu.models import wavenet_iaf as iaf
from fpsc_tpu.parallel import mesh as meshlib
from fpsc_tpu.train import checkpoint as ckpt
from fpsc_tpu.train.train_lpcnet import vocoder_inputs
from fpsc_tpu.train.train_vocoder import model_config


def gaussian_ll(mu, logs, target, log_std_min=-9.0):
    logs = jnp.clip(logs, min=log_std_min)
    lp = -0.5 * (math.log(2 * math.pi) + 2 * logs
                 + jnp.square(target - mu) * jnp.exp(-2 * logs))
    return -jnp.mean(lp)


def iaf_config(cfg: Config) -> iaf.IAFConfig:
    return iaf.IAFConfig(
        num_flows=cfg.iaf.num_flows, num_layers=cfg.iaf.num_layers,
        front_channels=cfg.iaf.front_channels,
        residual_channels=cfg.iaf.residual_channels,
        gate_channels=cfg.iaf.gate_channels,
        skip_channels=cfg.iaf.skip_channels,
        kernel_size=cfg.iaf.kernel_size,
        cout_channels=cfg.iaf.cout_channels)


def kl_gaussians(mu_q, logs_q, mu_p, logs_p, log_std_min=-9.0):
    """KL(q || p) between diagonal Gaussians, mean over elements
    (reference src/loss.py:25-37 KL_gaussians semantics: clamped
    log-stds + the closed form)."""
    logs_q = jnp.clip(logs_q, min=log_std_min)
    logs_p = jnp.clip(logs_p, min=log_std_min)
    var_q = jnp.exp(2 * logs_q)
    var_p = jnp.exp(2 * logs_p)
    kl = (logs_p - logs_q
          + (var_q + jnp.square(mu_q - mu_p)) / (2.0 * var_p) - 0.5)
    return jnp.mean(kl)


def loss_fn(params, icfg, key, teacher, mcfg, feat, periods, x, lpc,
            distill_weight: float = 0.0):
    """STFT-magnitude MSE + Gaussian LL on real excitation (the
    reference train_iaf.py:123-144 recipe), plus — when
    distill_weight > 0 and the teacher is TRAINED — probability-
    density distillation: the teacher WaveNet is teacher-forced on
    the STUDENT's own generated signal (excitation -> LPC synthesis
    IIR) and the per-sample KL between the student's accumulated flow
    Gaussian and the teacher's conditional is minimised (parallel-
    WaveNet distillation; the KL form mirrors reference loss.py:25-37).
    """
    pred = lpc_pred(x, lpc)
    exc = x - jnp.roll(pred, 1, axis=-1)
    c_up = wn.upsample(teacher.upsampler, mcfg,
                       jnp.swapaxes(feat, 1, 2), periods)
    z = jax.random.normal(key, x.shape)[:, None, :]
    exc_hat, mu_tot, logs_tot = iaf.iaf(params, icfg, z, c_up)
    spec_out = stft_mag(exc_hat[:, 0, 1:])
    spec_tgt = stft_mag(exc[:, 1:])
    loss_f = jnp.mean(jnp.square(spec_out - spec_tgt))
    loss_t = gaussian_ll(mu_tot[:, 0], logs_tot[:, 0], exc[:, 1:])
    loss = loss_f + loss_t
    if distill_weight > 0.0:
        from fpsc_tpu.dsp.lpc import lpc_synthesis
        # exc_hat is full length (B, 1, T); the accumulated flow
        # Gaussians (mu_tot/logs_tot, length T-1) model samples 1..T-1
        x_hat = lpc_synthesis(exc_hat[:, 0], lpc)     # student signal
        dist = wn.forward(teacher, mcfg, x_hat[:, None, :], periods,
                          jnp.swapaxes(feat, 1, 2))   # (B, 2, T)
        # teacher index t predicts exc[t+1]: t = 0..T-2 aligns
        # one-for-one with the student's outputs
        mu_t = dist[:, 0, :-1]
        logs_t = dist[:, 1, :-1]
        kl = kl_gaussians(mu_tot[:, 0], logs_tot[:, 0], mu_t, logs_t)
        loss = loss + distill_weight * kl
    return loss


def run(cfg: Config):
    mesh = meshlib.make_mesh()
    icfg = iaf_config(cfg)
    # IAF flows condition on cout_channels; reuse a WaveNet upsampler
    # (a transferred teacher's when given, else freshly initialised).
    mcfg = model_config(cfg)
    teacher = wn.init_wavenet(jax.random.PRNGKey(cfg.train.seed + 9),
                              mcfg)
    if cfg.train.transfer_model:
        payload = ckpt.load(ckpt.checkpoint_path(
            cfg.train.save_dir, cfg.train.transfer_model,
            cfg.train.transfer_epoch))
        teacher = ckpt.restore_params(
            teacher, payload, "teacher WaveNet")
        print("loaded teacher WaveNet")

    params = iaf.init_iaf(jax.random.PRNGKey(cfg.train.seed), icfg)
    tx = optax.chain(optax.clip_by_global_norm(cfg.train.grad_clip),
                     optax.adam(cfg.train.learning_rate))
    opt_state = tx.init(params)
    params = meshlib.replicate(mesh, params)

    ds = build_dataset(cfg.data, "train")

    distill_w = float(cfg.iaf.distill_weight)
    if distill_w > 0.0 and not cfg.train.transfer_model:
        raise ValueError(
            "iaf.distill_weight > 0 requires train.transfer_model to "
            "name a TRAINED teacher WaveNet (distilling from a random "
            "teacher is meaningless)")

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, key, feat, periods, x, lpc):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, icfg, key, teacher, mcfg, feat, periods, x, lpc,
            distill_weight=distill_w)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    label = cfg.label + "_iaf"
    key = jax.random.PRNGKey(cfg.train.seed)
    min_loss = float("inf")
    for epoch in range(cfg.train.epochs):
        t0 = time.time()
        total, n = 0.0, 0
        for batch in ds.iter_batches(cfg.data.batch_size,
                                     seed=cfg.train.seed + epoch):
            arrs = meshlib.shard_batch(
                mesh, vocoder_inputs(batch, cfg.data.normalize))
            key, sub = jax.random.split(key)
            params, opt_state, loss = train_step(
                params, opt_state, sub, arrs["feat"], arrs["periods"],
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
