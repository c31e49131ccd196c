"""Bunched LPCNet: one sample-net step emits TWO samples.

The fused sampler is dependency-latency bound (see
fpsc_tpu/ops/lpcnet_sampler.py: every micro-optimisation of the step
body measured negative), so the remaining speed lever is ALGORITHMIC -
halve the number of sequential recurrent steps.  Sample bunching
(after Vipperla et al., "Bunched LPCNet", Interspeech 2020) runs
GRU_A/GRU_B once per PAIR of samples and factorises the pair
autoregressively:

  P(e_2k, e_2k+1 | past) = P(e_2k | h_b) * P(e_2k+1 | h_b, x_2k, p_2k+1)

* GRU_A consumes the mu-law embeddings of BOTH previous samples and
  BOTH previous excitations plus the LPC prediction of the first
  sample of the pair: input = [emb(x_2k-2), emb(x_2k-1), emb(e_2k-2),
  emb(e_2k-1), emb(p_2k)] + conditioning (5E + cond wide vs 3E + cond
  dense - the recurrent matmuls halve, the input widens by 2E).
* Head 1 is the usual dual FC on h_b -> P(e_2k).
* Head 2 is a dual FC on [h_b, emb(x_2k), emb(p_2k+1)] -> P(e_2k+1):
  the second sample conditions on the realised first sample and its
  own LPC prediction, so the factorisation stays exactly
  autoregressive (no independence approximation; the capacity cost is
  only that the GRU state does not update between the two samples).

Measured ALTERNATIVE (not kept): running GRU_B at sample rate via a
second (3Hb, 3E) cell consuming [emb(x_2k), emb(e_2k), emb(p_2k+1)]
with the shared dual-FC head reading the state after each update.
At GRU_B 32 it matched this design's quality exactly (Bark-LSD 0.721
at 150 epochs on the speech fixtures) but ran ~4% SLOWER (the three
extra embedding gathers on the intra-pair critical path cost more
than the removed (2*levels, hb+2E) head matmul), and at GRU_B 16 it
was worse than this design at 32 (0.93 vs 0.72) - so the width of
GRU_B, not the update rate, is what matters, and the concat head is
the better speed/quality point.

This is a beyond-reference capability (the reference's vocoder is
plain LPCNet, reference README.md:13-15); quality is validated against
the unbunched model in scripts/validate_bunched.py and
scripts/validate_ab_wall_time.py (GRU_B 32 is the validated
deployment width).  The quality gap vs unbunched is a CONVERGENCE
phenomenon, not a ceiling: at 192 utterances the gap is 0.16
Bark-LSD at equal UPDATE count, 0.060 at 600 s equal WALL time, and
0.012 at 1200 s equal wall time (0.018 at the 96-utt converged
budget) - the bunched model converges slower per update but ~2x
faster per second, reaching parity once wall time allows; see
VALIDATION.md round-3 for the full budget grid.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fpsc_tpu.dsp import constants as C
from fpsc_tpu.dsp.mulaw import l2u_index, u2l
from fpsc_tpu.models import lpcnet
from fpsc_tpu.models.common import DenseParams, dense, embedding, init_dense
from fpsc_tpu.models.gru import _gates, gru_scan, init_gru


class BunchedParams(NamedTuple):
    base: lpcnet.LPCNetParams        # gru_a sized for the 5E+cond input
    fc3: DenseParams                 # head-2 dual FC branch 1
    fc4: DenseParams                 # head-2 dual FC branch 2


def init_bunched(key: jax.Array,
                 cfg: lpcnet.LPCNetConfig = lpcnet.LPCNetConfig()
                 ) -> BunchedParams:
    k0, k1, k2, k3 = jax.random.split(key, 4)
    base = lpcnet.init_lpcnet(k0, cfg)
    gru_a_in = 5 * cfg.embed_dim + cfg.cond_units
    base = base._replace(gru_a=init_gru(k1, gru_a_in, cfg.gru_a_units))
    h2_in = cfg.gru_b_units + 2 * cfg.embed_dim
    return BunchedParams(
        base=base,
        fc3=init_dense(k2, h2_in, cfg.levels),
        fc4=init_dense(k3, h2_in, cfg.levels),
    )


def _pair_streams(x: jax.Array, exc: jax.Array, pred: jax.Array
                  ) -> Tuple[jax.Array, ...]:
    """(B, T) streams -> per-pair views (B, K, 2), K = T // 2."""
    b, t = x.shape
    k = t // 2
    return (x.reshape(b, k, 2), exc.reshape(b, k, 2),
            pred.reshape(b, k, 2))


def forward(params: BunchedParams, feat: jax.Array, periods: jax.Array,
            x: jax.Array, exc: jax.Array, pred: jax.Array
            ) -> Tuple[jax.Array, jax.Array]:
    """Teacher-forced logits for both heads: ((B, K, 256), (B, K, 256)).

    x, exc, pred: (B, T) linear-scale streams with the same alignment
    as lpcnet.forward (pred[t] = LPC prediction of x[t] from PAST
    samples only)."""
    base = params.base
    cond = lpcnet.frame_net(base, feat, periods)
    # both samples of a pair share the frame conditioning
    cond_p = jnp.repeat(cond, C.FRAME_SIZE // 2, axis=1)  # (B, K, c)

    xb, eb, pb = _pair_streams(x, exc, pred)
    prev_x2 = jnp.roll(xb[:, :, 0], 1, axis=1).at[:, 0].set(0.0)
    prev_x1 = jnp.roll(xb[:, :, 1], 1, axis=1).at[:, 0].set(0.0)
    prev_e2 = jnp.roll(eb[:, :, 0], 1, axis=1).at[:, 0].set(0.0)
    prev_e1 = jnp.roll(eb[:, :, 1], 1, axis=1).at[:, 0].set(0.0)

    def emb(v):
        return embedding(base.sample_emb, l2u_index(v * 32768.0))

    inp = jnp.concatenate([
        emb(prev_x2), emb(prev_x1), emb(prev_e2), emb(prev_e1),
        emb(pb[:, :, 0]), cond_p], axis=-1)
    ya, _ = gru_scan(base.gru_a, inp)
    yb, _ = gru_scan(base.gru_b,
                     jnp.concatenate([ya, cond_p], axis=-1))
    logits1 = (jnp.tanh(dense(base.fc1, yb))
               + jnp.tanh(dense(base.fc2, yb)))
    h2in = jnp.concatenate([yb, emb(xb[:, :, 0]), emb(pb[:, :, 1])],
                           axis=-1)
    logits2 = (jnp.tanh(dense(params.fc3, h2in))
               + jnp.tanh(dense(params.fc4, h2in)))
    return logits1, logits2


def _seg_scan_nll(n_seg, carry_units, seg_fn, streams, b, k):
    """Shared chunked-CE driver (see lpcnet._chunked_nll for the
    why: XLA's 2 GiB single-buffer boundary at wide batch).  streams:
    list of (B, K, ...) arrays segmented over K into n_seg pieces;
    seg_fn((h_a, h_b), seg_streams) -> ((h_a, h_b), nll_sum) runs
    under jax.checkpoint so each segment rematerialises in the
    backward pass."""
    assert k % n_seg == 0, (k, n_seg)
    ks = k // n_seg

    def segs(a):
        return jnp.swapaxes(
            a.reshape(b, n_seg, ks, *a.shape[2:]), 0, 1)

    h0 = tuple(jnp.zeros((b, u), jnp.float32) for u in carry_units)
    _, nlls = jax.lax.scan(jax.checkpoint(seg_fn), h0,
                           tuple(segs(a) for a in streams))
    return jnp.sum(nlls)


def _chunked_nll2(params: BunchedParams, feat, periods, x, exc, pred,
                  exc_tgt, n_seg: int) -> jax.Array:
    """Chunked/rematerialised twin of the bunch=2 CE (identical loss
    and gradients; the (B, K, 3H) pre-activation buffer crosses the
    2 GiB boundary near batch 96 at flagship shapes)."""
    base = params.base
    b, t = x.shape
    cond = lpcnet.frame_net(base, feat, periods)
    cond_p = jnp.repeat(cond, C.FRAME_SIZE // 2, axis=1)
    xb, eb, pb = _pair_streams(x, exc, pred)
    prev_x2 = jnp.roll(xb[:, :, 0], 1, axis=1).at[:, 0].set(0.0)
    prev_x1 = jnp.roll(xb[:, :, 1], 1, axis=1).at[:, 0].set(0.0)
    prev_e2 = jnp.roll(eb[:, :, 0], 1, axis=1).at[:, 0].set(0.0)
    prev_e1 = jnp.roll(eb[:, :, 1], 1, axis=1).at[:, 0].set(0.0)
    ebt = exc_tgt.reshape(b, -1, 2)
    t1 = l2u_index(ebt[:, :, 0] * 32768.0)
    t2 = l2u_index(ebt[:, :, 1] * 32768.0)

    def emb(v):
        return embedding(base.sample_emb, l2u_index(v * 32768.0))

    def seg_fn(carry, seg):
        h_a, h_b = carry
        px2, px1, pe2, pe1, p0, x0, p1, conds, tg1, tg2 = seg
        inp = jnp.concatenate([
            emb(px2), emb(px1), emb(pe2), emb(pe1), emb(p0), conds],
            axis=-1)
        ya, h_a = gru_scan(base.gru_a, inp, h0=h_a)
        ybs, h_b = gru_scan(base.gru_b,
                            jnp.concatenate([ya, conds], axis=-1),
                            h0=h_b)
        logits1 = (jnp.tanh(dense(base.fc1, ybs))
                   + jnp.tanh(dense(base.fc2, ybs)))
        h2in = jnp.concatenate([ybs, emb(x0), emb(p1)], axis=-1)
        logits2 = (jnp.tanh(dense(params.fc3, h2in))
                   + jnp.tanh(dense(params.fc4, h2in)))
        nll = 0.0
        for logits, tgt in ((logits1, tg1), (logits2, tg2)):
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll += -jnp.sum(
                jnp.take_along_axis(logp, tgt[..., None], axis=-1))
        return (h_a, h_b), nll

    k = t // 2
    total = _seg_scan_nll(
        n_seg, (base.gru_a.units, base.gru_b.units), seg_fn,
        [prev_x2, prev_x1, prev_e2, prev_e1, pb[:, :, 0], xb[:, :, 0],
         pb[:, :, 1], cond_p, t1, t2], b, k)
    return total / (2.0 * b * k)


def loss_fn(params: BunchedParams, feat, periods, x, lpc,
            noise_key=None, noise_levels: int = 2,
            time_chunks: int = 0) -> jax.Array:
    """Mean CE over both heads (teacher forced); stream alignment
    identical to lpcnet.loss_fn.  noise_key enables the same mu-law
    noise injection as lpcnet.noisy_streams (head 2's realised-sample
    conditioning also flows through the noisy signal).  time_chunks
    as in lpcnet.loss_fn (identical loss, bounded activations)."""
    if noise_key is not None:
        x_in, exc_in, pred_t, exc_tgt = lpcnet.noisy_streams(
            x, lpc, noise_key, noise_levels)
    else:
        exc_tgt, pred_t = lpcnet.teacher_streams(x, lpc)
        x_in, exc_in = x, exc_tgt
    if time_chunks:
        return _chunked_nll2(params, feat, periods, x_in, exc_in,
                             pred_t, exc_tgt, time_chunks)
    logits1, logits2 = forward(params, feat, periods, x_in, exc_in,
                               pred_t)
    eb = exc_tgt.reshape(exc_tgt.shape[0], -1, 2)
    t1 = l2u_index(eb[:, :, 0] * 32768.0)
    t2 = l2u_index(eb[:, :, 1] * 32768.0)
    nll = 0.0
    for logits, tgt in ((logits1, t1), (logits2, t2)):
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll += -jnp.mean(
            jnp.take_along_axis(logp, tgt[..., None], axis=-1))
    return nll / 2.0


def sparsify_gru_a(params: BunchedParams, density: float,
                   block=(16, 32)) -> BunchedParams:
    """Block-sparsify the base model's GRU_A recurrent weights."""
    return params._replace(
        base=lpcnet.sparsify_gru_a(params.base, density, block))


# --------------------------------------------------------------------------
# Autoregressive synthesis (XLA oracle; the production path is the
# bunch=2 mode of ops/lpcnet_sampler.pallas_generate)
# --------------------------------------------------------------------------

# the ONE sampling-tail implementation lives in lpcnet.draw_excitation
# (the Pallas kernel's draw() mirrors it op for op)
_sample_step = lpcnet.draw_excitation


def generate(params: BunchedParams, feat: jax.Array, periods: jax.Array,
             lpc: jax.Array, key: jax.Array,
             corr: Optional[jax.Array] = None,
             deemphasis: float = 0.85,
             unroll: int = 4) -> jax.Array:
    """Batched bunched synthesis; contract matches lpcnet.generate
    (same feature conventions, same (L, B, 160) uniform stream layout
    consumed two per pair)."""
    base = params.base
    b, length, _ = feat.shape
    cond = lpcnet.frame_net(base, feat, periods)
    if corr is None:
        corr = jnp.clip(feat[..., 19] * C.MAXI, -0.5, 0.5)

    emb_t = base.sample_emb.table
    e_dim = emb_t.shape[1]
    wi_a = base.gru_a.wi
    cond_a = jnp.matmul(cond, wi_a[:, 5 * e_dim:].T,
                        preferred_element_type=jnp.float32) + base.gru_a.bi
    wi_b = base.gru_b.wi
    ha_units = base.gru_a.units
    wi_b_h = wi_b[:, :ha_units]
    cond_b = jnp.matmul(cond, wi_b[:, ha_units:].T,
                        preferred_element_type=jnp.float32) + base.gru_b.bi

    h_a = jnp.zeros((b, ha_units), jnp.float32)
    h_b = jnp.zeros((b, base.gru_b.units), jnp.float32)
    x_hist = jnp.zeros((b, C.LPC_ORDER), jnp.float32)
    e_p2 = jnp.zeros((b,), jnp.float32)
    e_p1 = jnp.zeros((b,), jnp.float32)
    prev_y = jnp.zeros((b,), jnp.float32)

    lpc_rev = lpc[..., ::-1]
    uniforms = jnp.transpose(
        jax.random.uniform(key, (length, b, C.FRAME_SIZE)),
        (0, 2, 1))
    # (L, 160, B) -> (L, 80, 2, B): pairs consume consecutive draws
    uniforms = uniforms.reshape(length, C.FRAME_SIZE // 2, 2, b)
    u2l_table = u2l(jnp.arange(256)) / 32768.0

    def emb_rows(v):
        return emb_t[l2u_index(v * 32768.0)]

    frame_xs = {
        "cond_a": jnp.swapaxes(cond_a, 0, 1),
        "cond_b": jnp.swapaxes(cond_b, 0, 1),
        "lpc": jnp.swapaxes(lpc_rev, 0, 1),
        "corr": jnp.swapaxes(corr, 0, 1),
        "u": uniforms,
    }

    def frame_step(carry, fx):
        temp = 1.0 + jnp.maximum(0.0, 1.5 * fx["corr"] - 0.5)[:, None]

        def pair_step(carry, u):
            h_a, h_b, x_hist, e_p2, e_p1, prev_y = carry
            pred1 = -jnp.sum(x_hist * fx["lpc"], axis=-1)
            inp = jnp.concatenate([
                emb_rows(x_hist[:, -2]), emb_rows(x_hist[:, -1]),
                emb_rows(e_p2), emb_rows(e_p1), emb_rows(pred1)],
                axis=-1)
            pre_a = jnp.dot(inp, wi_a[:, :5 * e_dim].T,
                            preferred_element_type=jnp.float32) + \
                fx["cond_a"]
            h_a = _gates(pre_a, h_a, base.gru_a.wh, base.gru_a.bh)
            pre_b = jnp.dot(h_a, wi_b_h.T,
                            preferred_element_type=jnp.float32) + \
                fx["cond_b"]
            h_b = _gates(pre_b, h_b, base.gru_b.wh, base.gru_b.bh)
            logits1 = (jnp.tanh(dense(base.fc1, h_b))
                       + jnp.tanh(dense(base.fc2, h_b)))
            e1 = _sample_step(logits1, temp, u[0][:, None], u2l_table)
            x1 = pred1 + e1
            x_hist = jnp.concatenate([x_hist[:, 1:], x1[:, None]],
                                     axis=1)
            pred2 = -jnp.sum(x_hist * fx["lpc"], axis=-1)
            h2in = jnp.concatenate(
                [h_b, emb_rows(x1), emb_rows(pred2)], axis=-1)
            logits2 = (jnp.tanh(dense(params.fc3, h2in))
                       + jnp.tanh(dense(params.fc4, h2in)))
            e2 = _sample_step(logits2, temp, u[1][:, None], u2l_table)
            x2 = pred2 + e2
            x_hist = jnp.concatenate([x_hist[:, 1:], x2[:, None]],
                                     axis=1)
            y1 = x1 + deemphasis * prev_y
            y2 = x2 + deemphasis * y1
            return ((h_a, h_b, x_hist, e1, e2, y2),
                    jnp.stack([y1, y2]))

        carry, ys = jax.lax.scan(pair_step, carry, fx["u"],
                                 unroll=unroll)
        return carry, ys

    _, ys = jax.lax.scan(
        frame_step, (h_a, h_b, x_hist, e_p2, e_p1, prev_y), frame_xs)
    # ys: (L, 80, 2, B) -> (B, T)
    return jnp.transpose(ys.reshape(length * C.FRAME_SIZE, b), (1, 0))


# --------------------------------------------------------------------------
# Bunch = 4: one recurrent step per FOUR samples
# --------------------------------------------------------------------------

class Bunched4Params(NamedTuple):
    """GRU_A/GRU_B once per 4 samples.  GRU_A input = embeddings of the
    FOUR previous samples + FOUR previous excitations + pred of the
    bunch's first sample (9E + cond).  Sub-samples 2..4 each get their
    own dual-FC head on [h_b, emb(x_prev1), emb(x_prev2), emb(pred_s)]
    (the two most recent realised samples + own LPC prediction; the
    prediction linearly summarises the full 16-sample history, so the
    factorisation conditions on everything that matters).  Head
    weights for the three positions are stacked row-wise:
    w (3*levels, hb + 3E).

    MEASURED TRADEOFF (96 utts, 400 epochs): ~2370-2420x RTF at batch
    128 (dense; sparsity no longer helps - the recurrent matmul is
    amortised over 4 samples) vs bunch=2's 2284x.  Quality: Bark-LSD
    0.837 at GRU_B 32, recovering to 0.704 at GRU_B 64 (at no RTF
    cost - the wider cell tiles the same), vs bunch=2's 0.534 and
    unbunched 0.516.  A 0.19-LSD cost where bunch=2 pays 0.018:
    bunch=2 is therefore the deployed default; this variant (at
    GRU_B 64) serves quality-tolerant applications."""
    base: lpcnet.LPCNetParams
    fc3: DenseParams                 # stacked position heads, branch 1
    fc4: DenseParams                 # stacked position heads, branch 2


def init_bunched4(key: jax.Array,
                  cfg: lpcnet.LPCNetConfig = lpcnet.LPCNetConfig()
                  ) -> Bunched4Params:
    k0, k1, k2, k3 = jax.random.split(key, 4)
    base = lpcnet.init_lpcnet(k0, cfg)
    gru_a_in = 9 * cfg.embed_dim + cfg.cond_units
    base = base._replace(gru_a=init_gru(k1, gru_a_in, cfg.gru_a_units))
    h2_in = cfg.gru_b_units + 3 * cfg.embed_dim
    return Bunched4Params(
        base=base,
        fc3=init_dense(k2, h2_in, 3 * cfg.levels),
        fc4=init_dense(k3, h2_in, 3 * cfg.levels),
    )


def forward4(params: Bunched4Params, feat, periods, x, exc, pred):
    """Teacher-forced logits, one (B, K, 256) per sub-sample (list of
    4); stream alignment identical to lpcnet.forward."""
    base = params.base
    levels = base.fc1.w.shape[0]
    cond = lpcnet.frame_net(base, feat, periods)
    cond_p = jnp.repeat(cond, C.FRAME_SIZE // 4, axis=1)   # (B, K, c)

    b, t = x.shape
    k = t // 4
    xb = x.reshape(b, k, 4)
    eb = exc.reshape(b, k, 4)
    pb = pred.reshape(b, k, 4)

    def emb(v):
        return embedding(base.sample_emb, l2u_index(v * 32768.0))

    def prev(stream, s):
        """value at global sub-position s-4 (previous bunch)."""
        r = jnp.roll(stream[:, :, s], 1, axis=1)
        return r.at[:, 0].set(0.0)

    inp = jnp.concatenate(
        [emb(prev(xb, s)) for s in range(4)]
        + [emb(prev(eb, s)) for s in range(4)]
        + [emb(pb[:, :, 0]), cond_p], axis=-1)
    ya, _ = gru_scan(base.gru_a, inp)
    yb, _ = gru_scan(base.gru_b,
                     jnp.concatenate([ya, cond_p], axis=-1))
    logits = [(jnp.tanh(dense(base.fc1, yb))
               + jnp.tanh(dense(base.fc2, yb)))]
    for s in range(1, 4):
        # realised samples s-1 and s-2 within/before the bunch
        xp1 = xb[:, :, s - 1]
        xp2 = xb[:, :, s - 2] if s >= 2 else prev(xb, 3)
        h2in = jnp.concatenate(
            [yb, emb(xp1), emb(xp2), emb(pb[:, :, s])], axis=-1)
        r0 = (s - 1) * levels
        w3 = params.fc3.w[r0:r0 + levels]
        b3 = params.fc3.b[r0:r0 + levels]
        w4 = params.fc4.w[r0:r0 + levels]
        b4 = params.fc4.b[r0:r0 + levels]
        logits.append(
            jnp.tanh(jnp.dot(h2in, w3.T,
                             preferred_element_type=jnp.float32) + b3)
            + jnp.tanh(jnp.dot(h2in, w4.T,
                               preferred_element_type=jnp.float32) + b4))
    return logits


def _chunked_nll4(params: Bunched4Params, feat, periods, x, exc,
                  pred, exc_tgt, n_seg: int) -> jax.Array:
    """Chunked/rematerialised twin of the bunch=4 CE (see
    _chunked_nll2)."""
    base = params.base
    levels = base.fc1.w.shape[0]
    b, t = x.shape
    k = t // 4
    cond = lpcnet.frame_net(base, feat, periods)
    cond_p = jnp.repeat(cond, C.FRAME_SIZE // 4, axis=1)
    xb = x.reshape(b, k, 4)
    eb = exc.reshape(b, k, 4)
    pb = pred.reshape(b, k, 4)
    tgt = l2u_index(exc_tgt.reshape(b, k, 4) * 32768.0)

    def prev(stream, s):
        r = jnp.roll(stream[:, :, s], 1, axis=1)
        return r.at[:, 0].set(0.0)

    prev_xs = [prev(xb, s) for s in range(4)]
    prev_es = [prev(eb, s) for s in range(4)]
    prev_x3 = prev(xb, 3)           # xp2 for head s=1

    def emb(v):
        return embedding(base.sample_emb, l2u_index(v * 32768.0))

    def seg_fn(carry, seg):
        h_a, h_b = carry
        (px0, px1, px2, px3, pe0, pe1, pe2, pe3, px3g, xbs, pbs,
         conds, tgts) = seg
        inp = jnp.concatenate(
            [emb(v) for v in (px0, px1, px2, px3,
                              pe0, pe1, pe2, pe3)]
            + [emb(pbs[:, :, 0]), conds], axis=-1)
        ya, h_a = gru_scan(base.gru_a, inp, h0=h_a)
        ybs, h_b = gru_scan(base.gru_b,
                            jnp.concatenate([ya, conds], axis=-1),
                            h0=h_b)
        logits = [(jnp.tanh(dense(base.fc1, ybs))
                   + jnp.tanh(dense(base.fc2, ybs)))]
        for s in range(1, 4):
            xp1 = xbs[:, :, s - 1]
            xp2 = xbs[:, :, s - 2] if s >= 2 else px3g
            h2in = jnp.concatenate(
                [ybs, emb(xp1), emb(xp2), emb(pbs[:, :, s])], axis=-1)
            r0 = (s - 1) * levels
            w3 = params.fc3.w[r0:r0 + levels]
            b3 = params.fc3.b[r0:r0 + levels]
            w4 = params.fc4.w[r0:r0 + levels]
            b4 = params.fc4.b[r0:r0 + levels]
            logits.append(
                jnp.tanh(jnp.dot(h2in, w3.T,
                                 preferred_element_type=jnp.float32)
                         + b3)
                + jnp.tanh(jnp.dot(h2in, w4.T,
                                   preferred_element_type=jnp.float32)
                           + b4))
        nll = 0.0
        for s in range(4):
            logp = jax.nn.log_softmax(logits[s], axis=-1)
            nll += -jnp.sum(jnp.take_along_axis(
                logp, tgts[:, :, s][..., None], axis=-1))
        return (h_a, h_b), nll

    total = _seg_scan_nll(
        n_seg, (base.gru_a.units, base.gru_b.units), seg_fn,
        prev_xs + prev_es + [prev_x3, xb, pb, cond_p, tgt], b, k)
    return total / (4.0 * b * k)


def loss_fn4(params: Bunched4Params, feat, periods, x, lpc,
             noise_key=None, noise_levels: int = 2,
             time_chunks: int = 0) -> jax.Array:
    if noise_key is not None:
        x_in, exc_in, pred_t, exc_tgt = lpcnet.noisy_streams(
            x, lpc, noise_key, noise_levels)
    else:
        exc_tgt, pred_t = lpcnet.teacher_streams(x, lpc)
        x_in, exc_in = x, exc_tgt
    if time_chunks:
        return _chunked_nll4(params, feat, periods, x_in, exc_in,
                             pred_t, exc_tgt, time_chunks)
    logits = forward4(params, feat, periods, x_in, exc_in, pred_t)
    b, t = x.shape
    eb = exc_tgt.reshape(b, t // 4, 4)
    nll = 0.0
    for s in range(4):
        tgt = l2u_index(eb[:, :, s] * 32768.0)
        logp = jax.nn.log_softmax(logits[s], axis=-1)
        nll += -jnp.mean(
            jnp.take_along_axis(logp, tgt[..., None], axis=-1))
    return nll / 4.0


def sparsify_gru_a4(params: Bunched4Params, density: float,
                    block=(16, 32)) -> Bunched4Params:
    return params._replace(
        base=lpcnet.sparsify_gru_a(params.base, density, block))


def generate4(params: Bunched4Params, feat, periods, lpc, key,
              corr: Optional[jax.Array] = None,
              deemphasis: float = 0.85,
              unroll: int = 2) -> jax.Array:
    """XLA oracle for the bunch=4 sampler; same uniform-stream
    contract (consumed four per bunch)."""
    base = params.base
    levels = base.fc1.w.shape[0]
    b, length, _ = feat.shape
    cond = lpcnet.frame_net(base, feat, periods)
    if corr is None:
        corr = jnp.clip(feat[..., 19] * C.MAXI, -0.5, 0.5)

    emb_t = base.sample_emb.table
    e_dim = emb_t.shape[1]
    wi_a = base.gru_a.wi
    cond_a = jnp.matmul(cond, wi_a[:, 9 * e_dim:].T,
                        preferred_element_type=jnp.float32) + base.gru_a.bi
    wi_b = base.gru_b.wi
    ha_units = base.gru_a.units
    wi_b_h = wi_b[:, :ha_units]
    cond_b = jnp.matmul(cond, wi_b[:, ha_units:].T,
                        preferred_element_type=jnp.float32) + base.gru_b.bi

    h_a = jnp.zeros((b, ha_units), jnp.float32)
    h_b = jnp.zeros((b, base.gru_b.units), jnp.float32)
    x_hist = jnp.zeros((b, C.LPC_ORDER), jnp.float32)
    e_hist = jnp.zeros((b, 4), jnp.float32)
    prev_y = jnp.zeros((b,), jnp.float32)

    lpc_rev = lpc[..., ::-1]
    uniforms = jnp.transpose(
        jax.random.uniform(key, (length, b, C.FRAME_SIZE)),
        (0, 2, 1)).reshape(length, C.FRAME_SIZE // 4, 4, b)
    u2l_table = u2l(jnp.arange(256)) / 32768.0

    def emb_rows(v):
        return emb_t[l2u_index(v * 32768.0)]

    frame_xs = {
        "cond_a": jnp.swapaxes(cond_a, 0, 1),
        "cond_b": jnp.swapaxes(cond_b, 0, 1),
        "lpc": jnp.swapaxes(lpc_rev, 0, 1),
        "corr": jnp.swapaxes(corr, 0, 1),
        "u": uniforms,
    }

    def frame_step(carry, fx):
        temp = 1.0 + jnp.maximum(0.0, 1.5 * fx["corr"] - 0.5)[:, None]

        def bunch_step(carry, u):
            h_a, h_b, x_hist, e_hist, prev_y = carry
            pred1 = -jnp.sum(x_hist * fx["lpc"], axis=-1)
            inp = jnp.concatenate(
                [emb_rows(x_hist[:, -4 + s]) for s in range(4)]
                + [emb_rows(e_hist[:, s]) for s in range(4)]
                + [emb_rows(pred1)], axis=-1)
            pre_a = jnp.dot(inp, wi_a[:, :9 * e_dim].T,
                            preferred_element_type=jnp.float32) + \
                fx["cond_a"]
            h_a = _gates(pre_a, h_a, base.gru_a.wh, base.gru_a.bh)
            pre_b = jnp.dot(h_a, wi_b_h.T,
                            preferred_element_type=jnp.float32) + \
                fx["cond_b"]
            h_b = _gates(pre_b, h_b, base.gru_b.wh, base.gru_b.bh)
            logits1 = (jnp.tanh(dense(base.fc1, h_b))
                       + jnp.tanh(dense(base.fc2, h_b)))
            ys, es = [], []
            pred_s = pred1
            for s in range(4):
                if s == 0:
                    logits = logits1
                else:
                    h2in = jnp.concatenate(
                        [h_b, emb_rows(x_hist[:, -1]),
                         emb_rows(x_hist[:, -2]),
                         emb_rows(pred_s)], axis=-1)
                    r0 = (s - 1) * levels
                    logits = (
                        jnp.tanh(jnp.dot(
                            h2in, params.fc3.w[r0:r0 + levels].T,
                            preferred_element_type=jnp.float32)
                            + params.fc3.b[r0:r0 + levels])
                        + jnp.tanh(jnp.dot(
                            h2in, params.fc4.w[r0:r0 + levels].T,
                            preferred_element_type=jnp.float32)
                            + params.fc4.b[r0:r0 + levels]))
                e_s = _sample_step(logits, temp, u[s][:, None],
                                   u2l_table)
                x_s = pred_s + e_s
                x_hist = jnp.concatenate(
                    [x_hist[:, 1:], x_s[:, None]], axis=1)
                es.append(e_s)
                y_s = x_s + deemphasis * prev_y
                prev_y = y_s
                ys.append(y_s)
                if s < 3:
                    pred_s = -jnp.sum(x_hist * fx["lpc"], axis=-1)
            e_hist = jnp.stack(es, axis=1)
            return ((h_a, h_b, x_hist, e_hist, prev_y),
                    jnp.stack(ys))

        carry, ys = jax.lax.scan(bunch_step, carry, fx["u"],
                                 unroll=unroll)
        return carry, ys

    _, ys = jax.lax.scan(
        frame_step, (h_a, h_b, x_hist, e_hist, prev_y), frame_xs)
    return jnp.transpose(ys.reshape(length * C.FRAME_SIZE, b), (1, 0))


def generate_any(params, *args, **kwargs):
    """Dispatch to the right XLA sampler for either bunched variant."""
    if isinstance(params, Bunched4Params):
        return generate4(params, *args, **kwargs)
    return generate(params, *args, **kwargs)
