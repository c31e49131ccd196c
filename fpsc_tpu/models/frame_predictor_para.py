"""Parallel-decoder frame predictor variant ("Wavernn_para").

Capability parity with reference src/models/wavernn_para.py:21-163:
the same GRU(20->G1) -> GRU(G1->G2) -> dual-FC trunk plus a third GRU
run over the TIME-REVERSED trunk output with a tanh head
(wavernn_para.py:64-69), giving a smoothed/parallel decode path.

Its closed-loop `encoder` matches the variant semantics at
wavernn_para.py:78-148: indicators multiply the residual BEFORE
quantisation (unlike the base model, which quantises the raw residual
of whichever stream fires).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from fpsc_tpu.models.common import DenseParams, dense, init_dense
from fpsc_tpu.models.frame_predictor import (NB_CEPS, Codebooks,
                                             _quantize_residual)
from fpsc_tpu.models.gru import GRUParams, gru_scan, gru_step, init_gru


@dataclass(frozen=True)
class ParaConfig:
    in_features: int = 20
    gru_units1: int = 384
    gru_units2: int = 128
    fc_units: int = NB_CEPS


class ParaParams(NamedTuple):
    rnn1: GRUParams
    rnn2: GRUParams
    rnn3: GRUParams
    fc: DenseParams


def init_para(key, cfg: ParaConfig = ParaConfig()) -> ParaParams:
    ks = jax.random.split(key, 4)
    return ParaParams(
        rnn1=init_gru(ks[0], cfg.in_features, cfg.gru_units1),
        rnn2=init_gru(ks[1], cfg.gru_units1, cfg.gru_units2),
        rnn3=init_gru(ks[2], cfg.fc_units, cfg.fc_units),
        fc=init_dense(ks[3], cfg.gru_units2, cfg.fc_units),
    )


def forward(params: ParaParams, x: jax.Array, h1=None, h2=None, h3=None):
    """x: (B, L, 20) -> (x_mid (B, L, 18), x_out (B, L, 18), h1,h2,h3).

    x_out runs rnn3 over the FLIPPED x_mid sequence (reference
    wavernn_para.py:68: rnn3 consumes torch.flip(x_mid, [1])).
    """
    y1, h1 = gru_scan(params.rnn1, x, h1)
    y2, h2 = gru_scan(params.rnn2, y1, h2)
    x_mid = 2.0 * jnp.tanh(dense(params.fc, jax.nn.relu(y2)))
    y3, h3 = gru_scan(params.rnn3, x_mid[:, ::-1, :], h3)
    x_out = jnp.tanh(y3)
    return x_mid, x_out, h1, h2, h3


def step(params: ParaParams, h1, h2, x):
    h1 = gru_step(params.rnn1, h1, x)
    h2 = gru_step(params.rnn2, h2, h1)
    return 2.0 * jnp.tanh(dense(params.fc, jax.nn.relu(h2))), h1, h2


def encoder(params: ParaParams, feat: jax.Array, l1: float, l2: float,
            codebooks: Optional[Codebooks] = None,
            mask: Optional[jax.Array] = None, qtz: bool = True):
    """Closed-loop encode with the para variant's masking order:
    r is indicator-masked FIRST, then quantised (wavernn_para.py:119-142).
    """
    b, length, _ = feat.shape
    ceps, pitch = feat[..., :NB_CEPS], feat[..., NB_CEPS:]
    h1 = jnp.zeros((b, params.rnn1.units), feat.dtype)
    h2 = jnp.zeros((b, params.rnn2.units), feat.dtype)
    prev = jnp.zeros((b, NB_CEPS), feat.dtype)

    xs = {"ceps": jnp.swapaxes(ceps, 0, 1),
          "pitch": jnp.swapaxes(pitch, 0, 1)}
    if mask is not None:
        xs["mask"] = jnp.swapaxes(mask, 0, 1)

    def scan_step(carry, x):
        h1, h2, prev = carry
        inp = jnp.concatenate([prev, x["pitch"]], axis=-1)
        f_out, h1, h2 = step(params, h1, h2, inp)
        r_s = x["ceps"] - f_out
        if mask is None:
            ind1 = jnp.abs(r_s[:, 0]) > l1
            ind2 = jnp.sum(jnp.abs(r_s[:, 1:]), axis=-1) > l2
        else:
            ind1 = ind2 = x["mask"][:, 0] > 0.5
        keep = jnp.concatenate(
            [ind1[:, None],
             jnp.repeat(ind2[:, None], NB_CEPS - 1, axis=1)], axis=1)
        r_masked = r_s * keep
        r_under = r_s.at[:, 0].set(0.0) * (1.0 - keep)
        if qtz:
            r_qtz, indices = _quantize_residual(
                codebooks, r_masked, ind1, ind2)
            prev = f_out + r_qtz
            out = {"c_in": prev, "r": r_masked, "r_qtz": r_qtz,
                   "r_under": r_under, "ind1": ind1, "ind2": ind2,
                   "indices": indices}
        else:
            prev = f_out + r_masked
            out = {"c_in": prev, "r": r_masked,
                   "r_qtz": jnp.zeros_like(r_s), "r_under": r_under,
                   "ind1": ind1, "ind2": ind2}
        return (h1, h2, prev), out

    _, ys = jax.lax.scan(scan_step, (h1, h2, prev), xs)
    out = jax.tree_util.tree_map(lambda a: jnp.swapaxes(a, 0, 1), ys)
    out["c_in"] = jnp.concatenate([out["c_in"], pitch], axis=-1)
    return out
