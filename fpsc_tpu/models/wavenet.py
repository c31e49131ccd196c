"""WaveNet vocoder (Gaussian excitation + LPC) - TPU-native.

Capability parity with reference src/models/wavenet.py + modules.py:

* weight-normalised causal convs (modules.py:10-33) and gated dilated
  residual blocks with local conditioning (modules.py:36-77,
  sqrt(0.5) residual scaling),
* 2 blocks x 10 layers, kernel 2, front conv kernel 32
  (wavenet.py:36-49, config.py:48-57), Gaussian (mean, log_std) output,
* pitch-period embedding (256 x 64) + "fat upsampler" (2 convs + 2
  dense, tanh) + ConvTranspose2d x[10, 16] upsampling to sample rate
  (wavenet.py:58-81,93-115),
* teacher-forced forward runs fully parallel over time.

The autoregressive `generate_lpc` replaces the reference's
O(receptive_field) full-recompute per sample with torch.cuda.synchronize
each step (wavenet.py:137-193) by a lax.scan carrying per-layer ring
buffers (fast-WaveNet incremental convolutions): per sample each layer
does one matmul against its current input + one gather from its
dilation buffer.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fpsc_tpu.dsp import constants as C
from fpsc_tpu.models.common import (DenseParams, EmbeddingParams, dense,
                                    embedding, init_dense, init_embedding)

SQRT_HALF = math.sqrt(0.5)


@dataclass(frozen=True)
class WavenetConfig:
    out_channels: int = 2
    num_blocks: int = 2
    num_layers: int = 10
    inp_channels: int = 1
    residual_channels: int = 128
    gate_channels: int = 256
    skip_channels: int = 128
    kernel_size: int = 2
    cin_channels: int = 20          # conditioning features (pre-embed)
    cout_channels: int = 128
    front_kernel: int = 32
    fat_upsampler: bool = True
    local: bool = False
    upsample_scales: Tuple[int, ...] = (10, 16)
    period_embed: int = 64


class WNConvParams(NamedTuple):
    """Weight-normalised conv1d: w = g * v / ||v||_(in,k) (torch dim=0)."""
    v: jax.Array   # (out, in, k)
    g: jax.Array   # (out,)
    b: jax.Array   # (out,)


def init_wnconv(key, in_ch, out_ch, k, dtype=jnp.float32) -> WNConvParams:
    k1, _ = jax.random.split(key)
    # kaiming normal on v (reference inits the conv weight then wraps
    # weight_norm around it)
    std = math.sqrt(2.0 / (in_ch * k))
    v = jax.random.normal(k1, (out_ch, in_ch, k), dtype) * std
    g = jnp.sqrt(jnp.sum(v * v, axis=(1, 2)))
    return WNConvParams(v=v, g=g, b=jnp.zeros((out_ch,), dtype))


def wn_weight(p: WNConvParams) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(p.v * p.v, axis=(1, 2), keepdims=True))
    return p.g[:, None, None] * p.v / (norm + 1e-12)


def conv1d(p: WNConvParams, x: jax.Array, dilation: int = 1,
           causal: bool = True) -> jax.Array:
    """x: (B, C, T) -> (B, out, T). SAME length, causal left-pad."""
    w = wn_weight(p)
    k = w.shape[-1]
    pad = dilation * (k - 1)
    padding = [(pad, 0)] if causal else [(pad // 2, pad - pad // 2)]
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)
    return out + p.b[None, :, None]


class ResBlockParams(NamedTuple):
    filter_conv: WNConvParams
    gate_conv: WNConvParams
    res_conv: WNConvParams    # 1x1
    skip_conv: WNConvParams   # 1x1
    filter_cond: WNConvParams  # 1x1 on conditioning
    gate_cond: WNConvParams


def init_resblock(key, cfg: WavenetConfig) -> ResBlockParams:
    ks = jax.random.split(key, 6)
    rc, gc, sc, cc = (cfg.residual_channels, cfg.gate_channels,
                      cfg.skip_channels, cfg.cout_channels)
    return ResBlockParams(
        filter_conv=init_wnconv(ks[0], rc, gc, cfg.kernel_size),
        gate_conv=init_wnconv(ks[1], rc, gc, cfg.kernel_size),
        res_conv=init_wnconv(ks[2], gc, rc, 1),
        skip_conv=init_wnconv(ks[3], gc, sc, 1),
        filter_cond=init_wnconv(ks[4], cc, gc, 1),
        gate_cond=init_wnconv(ks[5], cc, gc, 1),
    )


def resblock(p: ResBlockParams, x: jax.Array, c: jax.Array,
             dilation: int):
    h_f = conv1d(p.filter_conv, x, dilation) + conv1d(p.filter_cond, c)
    h_g = conv1d(p.gate_conv, x, dilation) + conv1d(p.gate_cond, c)
    out = jnp.tanh(h_f) * jax.nn.sigmoid(h_g)
    res = conv1d(p.res_conv, out)
    skip = conv1d(p.skip_conv, out)
    return (x + res) * SQRT_HALF, skip


class UpsamplerParams(NamedTuple):
    period_emb: EmbeddingParams
    c_conv1: WNConvParams     # plain convs in reference (no WN) - we
    c_conv2: WNConvParams     # reuse WNConv with g == ||v|| (identity)
    c_fc1: DenseParams
    c_fc2: DenseParams
    convt: Tuple[jax.Array, ...]   # ConvTranspose2d kernels (1,1,3,2s)
    convt_g: Tuple[jax.Array, ...]
    convt_b: Tuple[jax.Array, ...]


class WavenetParams(NamedTuple):
    front: WNConvParams
    blocks: Tuple[ResBlockParams, ...]
    final1: WNConvParams
    final2: WNConvParams
    upsampler: Optional[UpsamplerParams]


def init_upsampler(key, cfg: WavenetConfig) -> UpsamplerParams:
    ks = jax.random.split(key, 8)
    cin = cfg.cin_channels + cfg.period_embed
    convt, convt_g, convt_b = [], [], []
    for i, s in enumerate(cfg.upsample_scales):
        k = jax.random.normal(ks[4 + i], (1, 1, 3, 2 * s)) * math.sqrt(
            2.0 / (3 * 2 * s))
        convt.append(k)
        convt_g.append(jnp.sqrt(jnp.sum(k * k)))
        convt_b.append(jnp.zeros(()))
    return UpsamplerParams(
        period_emb=init_embedding(ks[0], 512, cfg.period_embed),
        c_conv1=init_wnconv(ks[1], cin, cfg.cout_channels, 3),
        c_conv2=init_wnconv(ks[2], cfg.cout_channels, cfg.cout_channels, 3),
        c_fc1=init_dense(ks[3], cfg.cout_channels, cfg.cout_channels),
        c_fc2=init_dense(ks[7], cfg.cout_channels, cfg.cout_channels),
        convt=tuple(convt), convt_g=tuple(convt_g), convt_b=tuple(convt_b),
    )


def init_wavenet(key, cfg: WavenetConfig = WavenetConfig()
                 ) -> WavenetParams:
    n = cfg.num_blocks * cfg.num_layers
    ks = jax.random.split(key, n + 4)
    blocks = tuple(
        init_resblock(ks[i], cfg) for i in range(n))
    return WavenetParams(
        front=init_wnconv(ks[n], cfg.inp_channels, cfg.residual_channels,
                          cfg.front_kernel),
        blocks=blocks,
        final1=init_wnconv(ks[n + 1], cfg.skip_channels,
                           cfg.skip_channels, 1),
        final2=init_wnconv(ks[n + 2], cfg.skip_channels,
                           cfg.out_channels, 1),
        upsampler=init_upsampler(ks[n + 3], cfg),
    )


def dilations(cfg: WavenetConfig) -> List[int]:
    return [cfg.kernel_size ** (i % cfg.num_layers)
            for i in range(cfg.num_blocks * cfg.num_layers)]


def receptive_field_size(cfg: WavenetConfig) -> int:
    return (cfg.kernel_size - 1) * sum(dilations(cfg)) + cfg.front_kernel


def upsample(p: UpsamplerParams, cfg: WavenetConfig, c: jax.Array,
             periods: jax.Array) -> jax.Array:
    """c: (B, cin, L) features, periods: (B, L) int -> (B, cout, T)."""
    emb = jnp.transpose(
        embedding(p.period_emb, jnp.clip(periods, 0, 511)), (0, 2, 1))
    cfeat = jnp.concatenate([c, emb], axis=1)
    if cfg.fat_upsampler:
        cfeat = jnp.tanh(conv1d(p.c_conv1, cfeat, causal=False))
        cfeat = jnp.tanh(conv1d(p.c_conv2, cfeat, causal=False))
        cfeat = jnp.transpose(cfeat, (0, 2, 1))
        cfeat = jnp.tanh(dense(p.c_fc1, cfeat))
        cfeat = jnp.tanh(dense(p.c_fc2, cfeat))
        cfeat = jnp.transpose(cfeat, (0, 2, 1))
    # ConvTranspose2d x scales on (B, 1, C, L)
    x = cfeat[:, None]
    for kern, g, b, s in zip(p.convt, p.convt_g, p.convt_b,
                             cfg.upsample_scales):
        norm = jnp.sqrt(jnp.sum(kern * kern)) + 1e-12
        w = g * kern / norm
        # jax explicit padding pads the stride-dilated input; the torch
        # ConvTranspose2d padding p maps to lo = hi = k - 1 - p, so
        # (3, 2s) kernels with torch padding (1, s//2) become:
        pw = 2 * s - 1 - s // 2
        x = jax.lax.conv_transpose(
            x, w, strides=(1, s), padding=((1, 1), (pw, pw)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            transpose_kernel=True) + b
        x = jax.nn.leaky_relu(x, 0.4)
    return x[:, 0]


def wavenet_stack(params: WavenetParams, cfg: WavenetConfig,
                  x: jax.Array, c: jax.Array) -> jax.Array:
    """x: (B, inp, T); c: (B, cout, T) -> (B, out_channels, T)."""
    h = jax.nn.relu(conv1d(params.front, x))
    skip = 0.0
    for p, d in zip(params.blocks, dilations(cfg)):
        h, s = resblock(p, h, c, d)
        skip = skip + s
    out = jax.nn.relu(skip)
    out = jax.nn.relu(conv1d(params.final1, out))
    return conv1d(params.final2, out)


def forward(params: WavenetParams, cfg: WavenetConfig, x: jax.Array,
            periods: jax.Array, c: jax.Array) -> jax.Array:
    """Teacher-forced pass (reference wavenet.py:83-91)."""
    if cfg.local:
        cfeat = jnp.repeat(c, C.FRAME_SIZE, axis=-1)
    else:
        cfeat = upsample(params.upsampler, cfg, c, periods)
    return wavenet_stack(params, cfg, x, cfeat)


# --------------------------------------------------------------------------
# Incremental (ring-buffer) autoregressive generation
# --------------------------------------------------------------------------

def _conv_step(p: WNConvParams, window: jax.Array) -> jax.Array:
    """window: (B, C, k) most-recent-last -> (B, out)."""
    w = wn_weight(p)                        # (out, C, k)
    return jnp.einsum("bck,ock->bo", window, w,
                      precision=jax.lax.Precision.DEFAULT) + p.b


def generate_lpc(params: WavenetParams, cfg: WavenetConfig,
                 key: jax.Array, feat: jax.Array, periods: jax.Array,
                 lpc_sample: jax.Array,
                 deemphasis: float = 0.85) -> jax.Array:
    """Autoregressive synthesis with LPC prediction
    (reference wavenet.py:137-193, minus the per-sample full-receptive-
    field recompute).

    feat: (B, cin, L) frame features; periods: (B, L); lpc_sample:
    (B, T, 16) per-sample LPC.  Returns (B, T) de-emphasised audio.
    """
    b = feat.shape[0]
    length = feat.shape[-1]
    t_total = length * C.FRAME_SIZE
    if cfg.local:
        cond = jnp.repeat(feat, C.FRAME_SIZE, axis=-1)
    else:
        cond = upsample(params.upsampler, cfg, feat, periods)
    dils = dilations(cfg)
    rc = cfg.residual_channels

    # ring buffers: front (B, inp, front_kernel-1); per layer (B, rc, d)
    front_buf = jnp.zeros((b, cfg.inp_channels, cfg.front_kernel - 1))
    layer_bufs = tuple(jnp.zeros((b, rc, d)) for d in dils)
    hist = jnp.zeros((b, C.LPC_ORDER))
    prev_y = jnp.zeros((b,))

    # Training pairs the distribution for exc[t+1] with inputs
    # (x[t], cond[t]) (reference src/train.py:137-139); generation of
    # sample t therefore conditions on cond[t-1].  (The reference's
    # generate_lpc pairs x[i-1] with cond[i] - wavenet.py:161-178 -
    # which is inconsistent with its own training alignment; we use the
    # training-consistent shift.)
    cond_shift = jnp.concatenate([cond[:, :, :1], cond[:, :, :-1]],
                                 axis=-1)
    xs = {
        "cond": jnp.transpose(cond_shift, (2, 0, 1)),    # (T, B, cout)
        "lpc": jnp.swapaxes(lpc_sample[:, :t_total, ::-1], 0, 1),
        "eps": jax.random.normal(key, (t_total, b)),
    }

    def step(carry, xt):
        front_buf, layer_bufs, hist, prev_y = carry
        pred = -jnp.sum(hist * xt["lpc"], axis=-1)        # (B,)
        x_in = hist[:, -1][:, None]                       # x[t-1], (B, 1)
        window = jnp.concatenate(
            [front_buf, x_in[:, :, None]], axis=2)        # (B,1,K)
        h = jax.nn.relu(_conv_step(params.front, window))  # (B, rc)
        front_buf = window[:, :, 1:]

        cond_t = xt["cond"]                               # (B, cout)
        skip = 0.0
        new_bufs = []
        for p, d, buf in zip(params.blocks, dils, layer_bufs):
            past = buf[:, :, 0]                           # h[t-d]
            win = jnp.stack([past, h], axis=-1)           # (B, rc, 2)
            h_f = _conv_step(p.filter_conv, win) + (
                jnp.dot(cond_t, wn_weight(p.filter_cond)[:, :, 0].T)
                + p.filter_cond.b)
            h_g = _conv_step(p.gate_conv, win) + (
                jnp.dot(cond_t, wn_weight(p.gate_cond)[:, :, 0].T)
                + p.gate_cond.b)
            out = jnp.tanh(h_f) * jax.nn.sigmoid(h_g)
            res = jnp.dot(out, wn_weight(p.res_conv)[:, :, 0].T) + \
                p.res_conv.b
            s = jnp.dot(out, wn_weight(p.skip_conv)[:, :, 0].T) + \
                p.skip_conv.b
            new_bufs.append(
                jnp.concatenate([buf[:, :, 1:], h[:, :, None]], axis=2))
            h = (h + res) * SQRT_HALF
            skip = skip + s
        out = jax.nn.relu(skip)
        out = jax.nn.relu(
            jnp.dot(out, wn_weight(params.final1)[:, :, 0].T)
            + params.final1.b)
        dist = jnp.dot(out, wn_weight(params.final2)[:, :, 0].T) + \
            params.final2.b                               # (B, 2)
        exc = dist[:, 0] + jnp.exp(dist[:, 1]) * xt["eps"]
        sample = exc + pred
        hist = jnp.concatenate([hist[:, 1:], sample[:, None]], axis=1)
        y = deemphasis * prev_y + sample
        return (front_buf, tuple(new_bufs), hist, y), y

    _, ys = jax.lax.scan(step, (front_buf, layer_bufs, hist, prev_y), xs)
    return jnp.swapaxes(ys, 0, 1)
