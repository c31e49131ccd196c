"""Stateful frame-at-a-time codec for real-time serving.

The batch codec (fpsc_tpu.codec.codec) processes whole utterances as
scans; serving needs a 10 ms-frame streaming loop with persistent
state.  These classes wrap jitted single-frame steps:

  StreamingEncoder.encode_frame(feat20) -> per-frame symbols
  StreamingDecoder.decode_frame(symbols' residual, pitch) -> coded frame
  StreamingVocoder.synthesize_frame(coded frame) -> 160 samples

State (GRU carries, previous coded frame, vocoder sample history) lives
on-device between calls; each call is one compiled program.  The
streaming path is bit-identical to the batch scan (tested).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from fpsc_tpu.dsp import constants as C
from fpsc_tpu.models import frame_predictor as fp
from fpsc_tpu.models import lpcnet
from fpsc_tpu.models.gru import gru_step


class StreamingEncoder:
    def __init__(self, params: fp.FramePredictorParams,
                 codebooks: fp.Codebooks, l1: float = 0.09,
                 l2: float = 0.28):
        self.params = params
        self.codebooks = codebooks
        self.reset()

        def step(state, feat_row):
            h1, h2, prev = state
            x = jnp.concatenate([prev, feat_row[None, 18:]], axis=-1)
            f_out, h1, h2 = fp.step(params, h1, h2, x)
            r_s = feat_row[None, :18] - f_out
            ind1 = jnp.abs(r_s[:, 0]) > l1
            ind2 = jnp.sum(jnp.abs(r_s[:, 1:]), axis=-1) > l2
            r_qtz, indices = fp._quantize_residual(codebooks, r_s,
                                                   ind1, ind2)
            prev = f_out + r_qtz
            coded = jnp.concatenate([prev[0], feat_row[18:]])
            return (h1, h2, prev), {
                "ind1": ind1[0], "ind2": ind2[0],
                "indices": {k: v[0] for k, v in indices.items()},
                "coded": coded}

        self._step = jax.jit(step)

    def reset(self):
        self.state = (
            jnp.zeros((1, self.params.rnn1.units)),
            jnp.zeros((1, self.params.rnn2.units)),
            jnp.zeros((1, fp.NB_CEPS)),
        )

    def encode_frame(self, feat_row: np.ndarray) -> Dict:
        """feat_row: (20,) normalised [ceps|pitch] frame."""
        self.state, out = self._step(self.state,
                                     jnp.asarray(feat_row, jnp.float32))
        return jax.tree_util.tree_map(np.asarray, out)


class StreamingDecoder:
    def __init__(self, params: fp.FramePredictorParams,
                 codebooks: fp.Codebooks):
        self.params = params
        self.codebooks = codebooks
        self.reset()

        from fpsc_tpu.quant.scalar import scl_dequantize
        from fpsc_tpu.quant.vq import vq_dequantize

        def step(state, ind1, ind2, indices, pitch_row):
            h1, h2, prev = state
            safe = lambda i: jnp.maximum(i, 0)
            r0_a = scl_dequantize(safe(indices["scl"]), codebooks.scl)
            r0_b = (scl_dequantize(safe(indices["scl_bl"]),
                                   codebooks.scl_bl)
                    if codebooks.scl_bl is not None
                    else jnp.zeros_like(r0_a))
            r0 = jnp.where(ind1, r0_a, r0_b)
            rv_a = vq_dequantize(safe(indices["vq"]), codebooks.vq)
            rv_b = (vq_dequantize(safe(indices["vq_bl"]),
                                  codebooks.vq_bl)
                    if codebooks.vq_bl is not None
                    else jnp.zeros_like(rv_a))
            rv = jnp.where(ind2, rv_a, rv_b)
            r_qtz = jnp.concatenate([r0[None], rv])
            x = jnp.concatenate([prev, pitch_row[None]], axis=-1)
            f_out, h1, h2 = fp.step(self.params, h1, h2, x)
            coded = f_out[0] + r_qtz
            return (h1, h2, coded[None]), jnp.concatenate(
                [coded, pitch_row])

        self._step = jax.jit(step)

    def reset(self):
        self.state = (
            jnp.zeros((1, self.params.rnn1.units)),
            jnp.zeros((1, self.params.rnn2.units)),
            jnp.zeros((1, fp.NB_CEPS)),
        )

    def decode_frame(self, ind1: bool, ind2: bool, indices: Dict,
                     pitch_row: np.ndarray) -> np.ndarray:
        """-> (20,) normalised coded frame."""
        self.state, coded = self._step(
            self.state, jnp.asarray(bool(ind1)), jnp.asarray(bool(ind2)),
            {k: jnp.asarray(v) for k, v in indices.items()},
            jnp.asarray(pitch_row, jnp.float32))
        return np.asarray(coded)


class StreamingVocoder:
    """LPCNet sampler, one 10 ms frame (160 samples) per call."""

    def __init__(self, params: lpcnet.LPCNetParams, seed: int = 0):
        self.params = params
        self.key = jax.random.PRNGKey(seed)
        self.reset()

        def frame_step(state, key, coded_row):
            h_a, h_b, hist, prev_e, prev_y = state
            feat = coded_row[None, None, :20]
            # coded_row is MAXI-normalised; the period formula and the
            # sampling sharpening operate on RAW-scale pitch features
            # (reference src/train.py:123 and :79-92), matching the
            # batch path (train_lpcnet.vocoder_inputs).
            period = (0.1 + 50.0 * coded_row[18] * C.MAXI + 100.0
                      ).astype(jnp.int32)[None, None]
            cond = lpcnet.frame_net(params, feat, period)[0, 0]  # (cond,)
            from fpsc_tpu.dsp.ceps2lpc import ceps2lpc
            _, lpc, _ = ceps2lpc(coded_row[None, :18] * C.MAXI)
            lpc_rev = lpc[0, ::-1]
            corr = jnp.clip(coded_row[19] * C.MAXI, -0.5, 0.5)
            uniforms = jax.random.uniform(key, (C.FRAME_SIZE, 1, 1))
            emb = params.sample_emb.table
            from fpsc_tpu.dsp.mulaw import l2u_index, u2l
            u2l_table = u2l(jnp.arange(256)) / 32768.0
            gamma = jnp.maximum(1.5 * corr - 0.5, 0.0)

            def sample_step(carry, u):
                h_a, h_b, hist, prev_e, prev_y = carry
                pred = -jnp.sum(hist * lpc_rev[None], axis=-1)
                pre = jnp.concatenate([
                    emb[l2u_index(hist[:, -1] * 32768.0)],
                    emb[l2u_index(prev_e * 32768.0)],
                    emb[l2u_index(pred * 32768.0)],
                    cond[None]], axis=-1)
                h_a = gru_step(params.gru_a, h_a, pre)
                h_b = gru_step(params.gru_b, h_b, jnp.concatenate(
                    [h_a, cond[None]], axis=-1))
                logits = lpcnet._logits(params, h_b)
                p = jax.nn.softmax(logits * (1.0 + gamma), axis=-1)
                p = jnp.maximum(p - 0.002, 0.0)
                cdf = jnp.cumsum(p, axis=-1)
                e_idx = jnp.sum(
                    (cdf < u * cdf[:, -1:]).astype(jnp.int32), axis=-1)
                e_lin = u2l_table[e_idx]
                sample = pred + e_lin
                hist = jnp.concatenate([hist[:, 1:], sample[:, None]], 1)
                y = sample + 0.85 * prev_y
                return (h_a, h_b, hist, e_lin, y), y[0]

            state, ys = jax.lax.scan(
                sample_step, (h_a, h_b, hist, prev_e, prev_y), uniforms)
            return state, ys

        self._step = jax.jit(frame_step)

    def reset(self):
        self.state = (
            jnp.zeros((1, self.params.gru_a.units)),
            jnp.zeros((1, self.params.gru_b.units)),
            jnp.zeros((1, C.LPC_ORDER)),
            jnp.zeros((1,)),
            jnp.zeros((1,)),
        )

    def synthesize_frame(self, coded_row: np.ndarray) -> np.ndarray:
        """coded_row: (20,) normalised coded frame -> (160,) samples."""
        self.key, sub = jax.random.split(self.key)
        self.state, ys = self._step(self.state, sub,
                                    jnp.asarray(coded_row, jnp.float32))
        return np.asarray(ys)
