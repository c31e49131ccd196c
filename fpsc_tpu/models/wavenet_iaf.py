"""Parallel WaveNet-IAF student (flow-based excitation model).

Capability parity with reference src/models/wavenet_iaf.py: a stack of
`num_flows` causal WaveNet flows transforming noise z into excitation,
accumulating (mu_tot, logs_tot) across flows exactly as the reference's
`iaf` recurrence (wavenet_iaf.py:51-63):

    mu_logs = flow_i(z, c)
    mu, logs = mu_logs[:, 0, :-1], mu_logs[:, 1, :-1]
    mu_tot = mu_tot * exp(logs) + mu
    logs_tot += logs
    z = pad(z[:, 1:] * exp(logs) + mu, left 1 zero)

Each flow reuses the WaveNet residual stack (no upsampler of its own;
conditioning is upsampled once by the teacher or the shared upsampler,
reference train_iaf.py:123-127).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fpsc_tpu.models.wavenet import (WavenetConfig, init_wnconv,
                                     init_resblock, conv1d, resblock,
                                     dilations)


@dataclass(frozen=True)
class IAFConfig:
    num_flows: int = 6
    num_layers: int = 10
    front_channels: int = 32
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    kernel_size: int = 3
    cout_channels: int = 128


class FlowParams(NamedTuple):
    front: object
    blocks: Tuple
    final1: object
    final2: object


class IAFParams(NamedTuple):
    flows: Tuple[FlowParams, ...]


def _flow_cfg(cfg: IAFConfig) -> WavenetConfig:
    return WavenetConfig(
        out_channels=2, num_blocks=1, num_layers=cfg.num_layers,
        inp_channels=1, residual_channels=cfg.residual_channels,
        gate_channels=cfg.gate_channels, skip_channels=cfg.skip_channels,
        kernel_size=cfg.kernel_size, cout_channels=cfg.cout_channels,
        front_kernel=cfg.front_channels)


def init_flow(key, cfg: IAFConfig) -> FlowParams:
    wcfg = _flow_cfg(cfg)
    n = cfg.num_layers
    ks = jax.random.split(key, n + 3)
    return FlowParams(
        front=init_wnconv(ks[n], 1, cfg.residual_channels,
                          cfg.front_channels),
        blocks=tuple(init_resblock(ks[i], wcfg) for i in range(n)),
        final1=init_wnconv(ks[n + 1], cfg.skip_channels,
                           cfg.skip_channels, 1),
        final2=init_wnconv(ks[n + 2], cfg.skip_channels, 2, 1),
    )


def init_iaf(key, cfg: IAFConfig = IAFConfig()) -> IAFParams:
    ks = jax.random.split(key, cfg.num_flows)
    return IAFParams(flows=tuple(init_flow(k, cfg) for k in ks))


def flow_forward(p: FlowParams, cfg: IAFConfig, z: jax.Array,
                 c: jax.Array) -> jax.Array:
    """z: (B, 1, T); c: (B, cout, T) -> (B, 2, T)."""
    wcfg = _flow_cfg(cfg)
    h = jax.nn.relu(conv1d(p.front, z))
    skip = 0.0
    for blk, d in zip(p.blocks, dilations(wcfg)):
        h, s = resblock(blk, h, c, d)
        skip = skip + s
    out = jax.nn.relu(skip)
    out = jax.nn.relu(conv1d(p.final1, out))
    return conv1d(p.final2, out)


def iaf(params: IAFParams, cfg: IAFConfig, z: jax.Array,
        c_up: jax.Array):
    """z: (B, 1, T) noise; c_up: (B, cout, T) upsampled conditioning.

    Returns (x (B, 1, T), mu_tot (B, 1, T-1), logs_tot (B, 1, T-1)).
    """
    mu_tot = 0.0
    logs_tot = 0.0
    for p in params.flows:
        mu_logs = flow_forward(p, cfg, z, c_up)
        mu = mu_logs[:, 0:1, :-1]
        logs = mu_logs[:, 1:2, :-1]
        mu_tot = mu_tot * jnp.exp(logs) + mu
        logs_tot = logs_tot + logs
        z_new = z[:, :, 1:] * jnp.exp(logs) + mu
        z = jnp.pad(z_new, ((0, 0), (0, 0), (1, 0)))
    return z, mu_tot, logs_tot


def generate(params: IAFParams, cfg: IAFConfig, z: jax.Array,
             c_up: jax.Array) -> jax.Array:
    x, _, _ = iaf(params, cfg, z, c_up)
    return x
