"""LPCNet-class vocoder: frame conditioning net + sample-rate dual GRU.

The reference pipeline's actual vocoder is xiph/LPCNet's external
TF2/Keras + C implementation (reference README.md:13-15,30-47; feature
files are produced for it by synthesis_qtz.py:149-166).  This module is
the in-framework TPU-native equivalent, sized per the paper's setup
(GRU_A 384, GRU_B 16, 256-level mu-law excitation):

* frame net: [feat(20) | period-embedding(64)] -> conv1d(k=3) x2 tanh
  -> dense x2 tanh -> 128-d conditioning per frame,
* sample net: mu-law embeddings of (prev signal, prev excitation,
  current LPC prediction) + conditioning -> GRU_A(384) -> GRU_B(16)
  -> dual FC -> 256-way softmax over the mu-law excitation,
* training is teacher-forced: every per-sample input comes from ground
  truth, so the whole sequence runs as two GRU scans with all matmuls
  batched (B*T, .) on the MXU,
* sampling is a lax.scan over 16 kHz steps carrying (h_a, h_b, last
  sample, last excitation, 16-sample LPC history), batched over
  utterances; weights stay resident in VMEM across the scan.  The
  probability shaping (pitch-correlation sharpening, constant tail
  cut) follows the reference's sample_mu_prob (src/train.py:79-92).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from fpsc_tpu.dsp import constants as C
from fpsc_tpu.dsp.mulaw import l2u_index, u2l
from fpsc_tpu.models.common import (DenseParams, EmbeddingParams, dense,
                                    embedding, init_dense, init_embedding)
from fpsc_tpu.models.gru import GRUParams, gru_scan, init_gru


@dataclass(frozen=True)
class LPCNetConfig:
    feat_dim: int = 20
    period_embed: int = 64
    cond_units: int = 128
    embed_dim: int = 128
    gru_a_units: int = 384
    gru_b_units: int = 16
    levels: int = 256
    frame_kernel: int = 3


class LPCNetParams(NamedTuple):
    period_emb: EmbeddingParams      # (512, 64)
    conv1: jax.Array                 # (k, in, cond)
    conv1_b: jax.Array
    conv2: jax.Array
    conv2_b: jax.Array
    fdense1: DenseParams
    fdense2: DenseParams
    sample_emb: EmbeddingParams      # shared mu-law embedding (256, 128)
    gru_a: GRUParams
    gru_b: GRUParams
    fc1: DenseParams                 # dual FC branch 1 (levels, gru_b)
    fc2: DenseParams                 # dual FC branch 2


def init_lpcnet(key: jax.Array, cfg: LPCNetConfig = LPCNetConfig()
                ) -> LPCNetParams:
    ks = jax.random.split(key, 12)
    in_dim = cfg.feat_dim + cfg.period_embed
    k = cfg.frame_kernel
    scale1 = 1.0 / jnp.sqrt(jnp.asarray(in_dim * k, jnp.float32))
    scale2 = 1.0 / jnp.sqrt(jnp.asarray(cfg.cond_units * k, jnp.float32))
    gru_a_in = 3 * cfg.embed_dim + cfg.cond_units
    return LPCNetParams(
        period_emb=init_embedding(ks[0], 512, cfg.period_embed),
        conv1=jax.random.uniform(ks[1], (k, in_dim, cfg.cond_units),
                                 jnp.float32, -scale1, scale1),
        conv1_b=jnp.zeros((cfg.cond_units,)),
        conv2=jax.random.uniform(ks[2], (k, cfg.cond_units, cfg.cond_units),
                                 jnp.float32, -scale2, scale2),
        conv2_b=jnp.zeros((cfg.cond_units,)),
        fdense1=init_dense(ks[3], cfg.cond_units, cfg.cond_units),
        fdense2=init_dense(ks[4], cfg.cond_units, cfg.cond_units),
        sample_emb=init_embedding(ks[5], cfg.levels, cfg.embed_dim),
        gru_a=init_gru(ks[6], gru_a_in, cfg.gru_a_units),
        gru_b=init_gru(ks[7], cfg.gru_a_units + cfg.cond_units,
                       cfg.gru_b_units),
        fc1=init_dense(ks[8], cfg.gru_b_units, cfg.levels),
        fc2=init_dense(ks[9], cfg.gru_b_units, cfg.levels),
    )


def frame_net(params: LPCNetParams, feat: jax.Array,
              periods: jax.Array) -> jax.Array:
    """(B, L, 20) features + (B, L) int periods -> (B, L, 128) cond."""
    emb = embedding(params.period_emb, jnp.clip(periods, 0, 511))
    x = jnp.concatenate([feat, emb], axis=-1)
    x = jnp.tanh(jax.lax.conv_general_dilated(
        x, params.conv1, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32) + params.conv1_b)
    x = jnp.tanh(jax.lax.conv_general_dilated(
        x, params.conv2, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32) + params.conv2_b)
    x = jnp.tanh(dense(params.fdense1, x))
    x = jnp.tanh(dense(params.fdense2, x))
    return x


def _logits(params: LPCNetParams, hb: jax.Array) -> jax.Array:
    """Dual FC head: sum of two tanh branches (capacity boost over the
    16-unit GRU_B bottleneck)."""
    return jnp.tanh(dense(params.fc1, hb)) + jnp.tanh(dense(params.fc2, hb))


def sample_inputs(params: LPCNetParams, x: jax.Array, exc: jax.Array,
                  pred: jax.Array, cond_up: jax.Array) -> jax.Array:
    """Teacher-forced per-sample GRU_A inputs.

    x, exc, pred: (B, T) linear-scale (16-bit range); cond_up: (B, T,
    cond).  Input at t uses x[t-1], exc[t-1], pred[t] (the network
    predicts the excitation that, added to pred[t], yields x[t]).
    """
    prev_x = jnp.roll(x, 1, axis=-1).at[:, 0].set(0.0)
    prev_e = jnp.roll(exc, 1, axis=-1).at[:, 0].set(0.0)
    # waveforms live in [-1, 1]; mu-law operates on the 16-bit range
    e_x = embedding(params.sample_emb, l2u_index(prev_x * 32768.0))
    e_e = embedding(params.sample_emb, l2u_index(prev_e * 32768.0))
    e_p = embedding(params.sample_emb, l2u_index(pred * 32768.0))
    return jnp.concatenate([e_x, e_e, e_p, cond_up], axis=-1)


def forward(params: LPCNetParams, feat: jax.Array, periods: jax.Array,
            x: jax.Array, exc: jax.Array, pred: jax.Array) -> jax.Array:
    """Teacher-forced logits (B, T, 256) over mu-law excitation."""
    cond = frame_net(params, feat, periods)
    cond_up = jnp.repeat(cond, C.FRAME_SIZE, axis=1)
    inp = sample_inputs(params, x, exc, pred, cond_up)
    ya, _ = gru_scan(params.gru_a, inp)
    yb, _ = gru_scan(params.gru_b,
                     jnp.concatenate([ya, cond_up], axis=-1))
    return _logits(params, yb)


def teacher_streams(x: jax.Array, lpc: jax.Array):
    """Teacher-forcing streams: (exc, pred_t), both (B, T).

    pred_t[t] is the LPC prediction of x[t] from PAST samples only
    (x[t-1..t-16]) and exc[t] = x[t] - pred_t[t]; pred_t[t] therefore
    never depends on x[>= t] (no target leakage), matching what
    generate() computes from its sample history at each step."""
    from fpsc_tpu.dsp.lpc import lpc_pred
    pred = lpc_pred(x, lpc)
    pred_t = jnp.roll(pred, 1, axis=-1).at[:, 0].set(0.0)
    return x - pred_t, pred_t


def noisy_streams(x: jax.Array, lpc: jax.Array, key: jax.Array,
                  levels: int = 2):
    """Exposure-bias noise injection (LPCNet training practice; Valin &
    Skoglund 2019 §3.4 inject mu-law-domain noise into the signal path
    so training-time inputs resemble generation's imperfect history).

    Perturbs the SIGNAL stream by up to +-levels mu-law codes, rebuilds
    the LPC prediction and the input-side excitation from the NOISY
    signal (exactly what generation derives from its own sample
    history), and computes the TARGET excitation relative to the noisy
    prediction but the CLEAN sample — the model learns to steer its
    trajectory back to the true signal instead of compounding errors.

    Returns (x_noisy, exc_in, pred_t_noisy, exc_target), all (B, T).
    """
    from fpsc_tpu.dsp.lpc import lpc_pred
    from fpsc_tpu.dsp.mulaw import u2l
    u = l2u_index(x * 32768.0)
    noise = jax.random.randint(key, u.shape, -levels, levels + 1)
    x_n = u2l(jnp.clip(u + noise, 0, 255)) / 32768.0
    pred = lpc_pred(x_n, lpc)
    pred_t = jnp.roll(pred, 1, axis=-1).at[:, 0].set(0.0)
    return x_n, x_n - pred_t, pred_t, x - pred_t


def _chunked_nll(params: LPCNetParams, feat, periods, x, exc, pred,
                 exc_tgt, n_seg: int) -> jax.Array:
    """Teacher-forced CE computed as a rematerialised scan over
    `n_seg` time segments (GRU states thread between segments, so the
    recurrence — and the loss — is exactly forward()'s; pinned in
    tests/test_lpcnet.py).

    Why: the one-shot forward materialises (B, T, 3H) input
    pre-activations and (B, T, 256) logits for the whole utterance —
    at the flagship T = 14400 the pre-activation buffer crosses the
    XLA 2 GiB single-buffer boundary between batch 32 (2.12 GB,
    compiles) and batch 64 (4.25 GB, hard compile failure via the
    remote helper) — measured in scripts/bench_train_scaling.py.
    Chunking bounds every buffer to T/n_seg and jax.checkpoint
    rematerialises each segment in the backward pass, trading one
    extra forward for n_seg x less residual memory: the wide-batch
    training regime (VERDICT r4 next #2) becomes compilable."""
    b, t = x.shape
    assert t % n_seg == 0, (t, n_seg)
    ts = t // n_seg
    assert ts % C.FRAME_SIZE == 0, (ts, C.FRAME_SIZE)
    cond = frame_net(params, feat, periods)
    cond_up = jnp.repeat(cond, C.FRAME_SIZE, axis=1)
    target = l2u_index(exc_tgt * 32768.0)
    # previous-sample streams roll ACROSS segment boundaries here,
    # exactly like the unchunked path
    prev_x = jnp.roll(x, 1, axis=-1).at[:, 0].set(0.0)
    prev_e = jnp.roll(exc, 1, axis=-1).at[:, 0].set(0.0)

    def segs(a):
        return jnp.swapaxes(
            a.reshape(b, n_seg, ts, *a.shape[2:]), 0, 1)

    @jax.checkpoint
    def seg_fn(carry, seg_in):
        h_a, h_b = carry
        pxs, pes, prs, conds, tgts = seg_in
        e_x = embedding(params.sample_emb, l2u_index(pxs * 32768.0))
        e_e = embedding(params.sample_emb, l2u_index(pes * 32768.0))
        e_p = embedding(params.sample_emb, l2u_index(prs * 32768.0))
        inp = jnp.concatenate([e_x, e_e, e_p, conds], axis=-1)
        ya, h_a = gru_scan(params.gru_a, inp, h0=h_a)
        yb, h_b = gru_scan(params.gru_b,
                           jnp.concatenate([ya, conds], axis=-1),
                           h0=h_b)
        logits = _logits(params, yb)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgts[..., None], axis=-1)
        return (h_a, h_b), jnp.sum(nll)

    h0 = (jnp.zeros((b, params.gru_a.units), jnp.float32),
          jnp.zeros((b, params.gru_b.units), jnp.float32))
    _, nlls = jax.lax.scan(
        seg_fn, h0, (segs(prev_x), segs(prev_e), segs(pred),
                     segs(cond_up), segs(target)))
    return jnp.sum(nlls) / (b * t)


def loss_fn(params: LPCNetParams, feat, periods, x, lpc,
            noise_key=None, noise_levels: int = 2,
            time_chunks: int = 0) -> jax.Array:
    """Cross-entropy on next-sample mu-law excitation (teacher forced).

    lpc_pred's raw output at t is the prediction of x[t+1] (it includes
    the x[t] term); the network input at step t must instead carry the
    prediction of x[t] from PAST samples only — exactly what generate()
    computes from its sample history — so the prediction stream is
    rolled by one before entering sample_inputs.  Feeding the unrolled
    stream would leak a1*x[t] into the input whose target is
    exc[t] = x[t] - pred[t-1] (reference keeps the same alignment,
    src/train.py:125-139).

    With noise_key set, the input streams are rebuilt through
    noisy_streams (mu-law noise injection; targets steer back to the
    clean signal).  time_chunks > 0 computes the identical loss as a
    rematerialised scan over that many time segments (_chunked_nll) —
    required past the ~2 GiB activation boundary (batch >= 64 at the
    flagship utterance length).
    """
    if noise_key is not None:
        x_in, exc_in, pred_t, exc_tgt = noisy_streams(
            x, lpc, noise_key, noise_levels)
    else:
        exc_tgt, pred_t = teacher_streams(x, lpc)
        x_in, exc_in = x, exc_tgt
    if time_chunks:
        return _chunked_nll(params, feat, periods, x_in, exc_in,
                            pred_t, exc_tgt, time_chunks)
    logits = forward(params, feat, periods, x_in, exc_in, pred_t)
    # target: excitation at t given inputs up to t (16-bit mu-law code)
    target = l2u_index(exc_tgt * 32768.0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)
    return jnp.mean(nll)


# --------------------------------------------------------------------------
# Autoregressive synthesis
# --------------------------------------------------------------------------

def shape_probs(probs: jax.Array, corr: jax.Array,
                tail_cut: float = 0.002) -> jax.Array:
    """LPCNet sampling tricks (reference src/train.py:79-92):
    sharpen by pitch correlation, cut the constant tail, renormalise."""
    gamma = jnp.maximum(0.0, 1.5 * corr - 0.5)[..., None]
    p = probs * jnp.power(probs, gamma)
    p = p / (1e-18 + jnp.sum(p, -1, keepdims=True))
    p = jnp.maximum(p - tail_cut, 0.0)
    return p / (1e-8 + jnp.sum(p, -1, keepdims=True))


def shape_logits(logits: jax.Array, corr: jax.Array,
                 tail_cut: float = 0.002) -> jax.Array:
    """Equivalent of shape_probs starting from logits: the p * p^gamma
    sharpening is exactly a softmax temperature (1 + gamma), which
    avoids the per-step pow over the 256 levels."""
    gamma = jnp.maximum(0.0, 1.5 * corr - 0.5)[..., None]
    p = jax.nn.softmax(logits * (1.0 + gamma), axis=-1)
    p = jnp.maximum(p - tail_cut, 0.0)
    return p / (1e-8 + jnp.sum(p, -1, keepdims=True))


def _categorical(key: jax.Array, probs: jax.Array) -> jax.Array:
    """Inverse-CDF sampling from probabilities (B, 256) -> (B,)."""
    cdf = jnp.cumsum(probs, axis=-1)
    u = jax.random.uniform(key, probs.shape[:-1] + (1,))
    return jnp.sum((cdf < u).astype(jnp.int32), axis=-1)


def draw_excitation(logits: jax.Array, temp: jax.Array, u: jax.Array,
                    u2l_table: jax.Array) -> jax.Array:
    """Shared sampling tail: (B, 256) logits + (B, 1) temperature +
    (B, 1) uniform -> (B,) linear-scale excitation.

    The ONE canonical copy of the sampling arithmetic that the Pallas
    kernel's draw() mirrors op for op (unnormalised exp - logits in
    [-2, 2] and temp <= 1.25, so no overflow and the max-subtraction
    is skipped; tail cut scaled by Z instead of normalising, since
    max(p/Z - c, 0) has the same argcdf as max(p - c*Z, 0);
    Hillis-Steele log-step prefix sum; total = last prefix element) -
    both XLA samplers (lpcnet.generate, lpcnet_bunched) call this so
    all three implementations flip identically on the same inputs."""
    p = jnp.exp(logits * temp)
    z = jnp.sum(p, axis=-1, keepdims=True)
    pcut = jnp.maximum(p - 0.002 * z, 0.0)
    n_lvl = pcut.shape[-1]
    cdf = pcut
    k = 1
    while k < n_lvl:
        cdf = cdf + jnp.where(jnp.arange(n_lvl) >= k,
                              jnp.roll(cdf, k, axis=-1), 0.0)
        k *= 2
    total = cdf[:, -1:]
    e_idx = jnp.sum((cdf < u * total).astype(jnp.int32), axis=-1)
    return u2l_table[e_idx]


def generate(params: LPCNetParams, feat: jax.Array, periods: jax.Array,
             lpc: jax.Array, key: jax.Array,
             corr: Optional[jax.Array] = None,
             deemphasis: float = 0.85,
             unroll: int = 8) -> jax.Array:
    """Batched autoregressive synthesis.

    feat: (B, L, 20) MAXI-normalised features (the vocoder's training
    convention, see train_lpcnet.vocoder_inputs); periods: (B, L) int;
    lpc: (B, L, 16) per-frame coefficients; returns (B, L*160)
    waveform (after de-emphasis).

    corr must be the RAW-scale pitch correlation (range ~[-0.5, 0.5])
    — the reference applies its sampling sharpening to raw corr
    (src/train.py:79-92).  The default un-normalises feat[..., 19] by
    MAXI and clips to the physical correlation range [-0.5, 0.5]
    (keeping gamma <= 0.25 as on real data); pass corr explicitly when
    feat is not MAXI-normalised.

    One lax.scan over T = L*160 steps; carry = (h_a, h_b, x_hist(16),
    prev_exc, prev_out).  Speed-of-light design notes:

    * the GRU_A *input* matmul is eliminated entirely: the mu-law
      embedding contributions are precomputed as 256-row tables of
      embedding @ W_input products (per-step cost becomes three 1152-d
      row gathers + adds), and the frame-conditioning contribution is
      computed at FRAME rate (L matmuls, not T) and gathered by frame
      index inside the scan - only the (B, H) @ (H, 3H) recurrent
      matmuls remain per step,
    * same split for GRU_B's input (h_a term per step, cond term per
      frame),
    * frame-rate streams are indexed with dynamic_index_in_dim instead
      of materialising (T, B, .) upsampled arrays,
    * `unroll` amortises scan loop overhead.
    """
    b, length, _ = feat.shape
    t_total = length * C.FRAME_SIZE
    cond = frame_net(params, feat, periods)               # (B, L, 128)
    if corr is None:
        corr = jnp.clip(feat[..., 19] * C.MAXI, -0.5, 0.5)

    emb = params.sample_emb.table                         # (256, E)
    e_dim = emb.shape[1]
    wi_a = params.gru_a.wi                                # (3H, 512)
    # Precomputed input-projection tables: one row per mu-law level.
    tab_x = jnp.matmul(emb, wi_a[:, :e_dim].T,
                       preferred_element_type=jnp.float32)
    tab_e = jnp.matmul(emb, wi_a[:, e_dim:2 * e_dim].T,
                       preferred_element_type=jnp.float32)
    tab_p = jnp.matmul(emb, wi_a[:, 2 * e_dim:3 * e_dim].T,
                       preferred_element_type=jnp.float32)
    # Frame-rate conditioning contributions (folding the biases in).
    cond_a = jnp.matmul(cond, wi_a[:, 3 * e_dim:].T,
                        preferred_element_type=jnp.float32) + params.gru_a.bi
    wi_b = params.gru_b.wi                                # (3Hb, Ha+cond)
    ha_units = params.gru_a.units
    wi_b_h = wi_b[:, :ha_units]
    cond_b = jnp.matmul(cond, wi_b[:, ha_units:].T,
                        preferred_element_type=jnp.float32) + params.gru_b.bi

    h_a = jnp.zeros((b, params.gru_a.units), jnp.float32)
    h_b = jnp.zeros((b, params.gru_b.units), jnp.float32)
    x_hist = jnp.zeros((b, C.LPC_ORDER), jnp.float32)     # newest last
    prev_e = jnp.zeros((b,), jnp.float32)
    prev_y = jnp.zeros((b,), jnp.float32)

    lpc_rev = lpc[..., ::-1]  # so sum(x_hist * lpc_rev) = sum a_k x[t-k]
    # All randomness precomputed: one uniform per emitted sample (the
    # per-step threefry chain would dominate the scan otherwise).
    # Canonical layout (L, B, 160) is shared with the Pallas sampler so
    # both backends consume the identical random stream.
    uniforms = jnp.transpose(
        jax.random.uniform(key, (length, b, C.FRAME_SIZE)),
        (0, 2, 1))[..., None]
    # mu-law decode as a 256-entry lookup (replaces exp per step)
    u2l_table = u2l(jnp.arange(256)) / 32768.0

    # Fold the three embedding tables into one so each step issues one
    # (3B,) gather instead of three op chains.
    tab_all = jnp.concatenate([tab_x, tab_e, tab_p], axis=0)  # (768, 3H)
    offsets = jnp.asarray([0, 256, 512], jnp.int32)[:, None]

    from fpsc_tpu.models.gru import _gates

    # Outer scan over frames (frame-constant streams hoisted), inner
    # scan over the 160 samples of the frame.
    frame_xs = {
        "cond_a": jnp.swapaxes(cond_a, 0, 1),   # (L, B, 3Ha)
        "cond_b": jnp.swapaxes(cond_b, 0, 1),   # (L, B, 3Hb)
        "lpc": jnp.swapaxes(lpc_rev, 0, 1),     # (L, B, 16)
        "corr": jnp.swapaxes(corr, 0, 1),       # (L, B)
        "u": uniforms,                          # (L, 160, B, 1)
    }

    def frame_step(carry, fx):
        gamma = jnp.maximum(0.0, 1.5 * fx["corr"] - 0.5)[:, None]
        temp = 1.0 + gamma

        def sample_step(carry, u):
            h_a, h_b, x_hist, prev_e, prev_y = carry
            pred = -jnp.sum(x_hist * fx["lpc"], axis=-1)
            idx = l2u_index(
                jnp.stack([x_hist[:, -1], prev_e, pred]) * 32768.0)
            gathered = tab_all[idx + offsets]        # (3, B, 3Ha)
            pre_a = (gathered[0] + gathered[1] + gathered[2]
                     + fx["cond_a"])
            h_a = _gates(pre_a, h_a, params.gru_a.wh, params.gru_a.bh)
            pre_b = jnp.dot(h_a, wi_b_h.T,
                            preferred_element_type=jnp.float32) + \
                fx["cond_b"]
            h_b = _gates(pre_b, h_b, params.gru_b.wh, params.gru_b.bh)
            logits = _logits(params, h_b)
            e_lin = draw_excitation(logits, temp, u, u2l_table)
            sample = pred + e_lin
            x_hist = jnp.concatenate([x_hist[:, 1:], sample[:, None]],
                                     axis=1)
            y = sample + deemphasis * prev_y
            return (h_a, h_b, x_hist, e_lin, y), y

        carry, ys = jax.lax.scan(sample_step, carry, fx["u"],
                                 unroll=unroll)
        return carry, ys

    _, ys = jax.lax.scan(
        frame_step, (h_a, h_b, x_hist, prev_e, prev_y), frame_xs)
    # ys: (L, 160, B) -> (B, T)
    return jnp.transpose(ys.reshape(t_total, b), (1, 0))


# --------------------------------------------------------------------------
# GRU_A recurrent-weight sparsification (LPCNet training practice)
# --------------------------------------------------------------------------

def gru_a_block_mask(wh: jax.Array, density: float,
                     block=(16, 32)) -> jax.Array:
    """Magnitude block mask for the recurrent matrix of GRU_A.

    The production LPCNet sparsifies each gate's (H, H) recurrent
    sub-matrix to ~10% density in small blocks, always keeping the
    diagonal blocks; this is the TPU-shaped analogue with lane-aligned
    blocks.  wh: (3H, H); returns a 0/1 mask of the same shape.
    """
    three_h, h = wh.shape
    bm, bn = block
    # shrink the block to the largest power-of-two divisor that fits,
    # so small test models still get multiple column blocks
    bm = min(bm, three_h)
    while three_h % bm:
        bm //= 2
    bn = min(bn, h)
    while h % bn:
        bn //= 2
    # ensure at least two column blocks so the forced diagonal does
    # not saturate the density target
    while h // bn < 2 and bn > 8:
        bn //= 2
    n_bm, n_bn = three_h // bm, h // bn
    blocks = wh.reshape(n_bm, bm, n_bn, bn)
    energy = jnp.sum(blocks * blocks, axis=(1, 3))      # (n_bm, n_bn)
    # always keep the diagonal blocks of each gate
    gate_rows = n_bm // 3
    row_in_gate = jnp.arange(n_bm) % gate_rows
    diag_col = (row_in_gate * bm) // bn
    is_diag = (jnp.arange(n_bn)[None, :] == diag_col[:, None])
    keep_n = max(1, int(round(density * n_bm * n_bn)))
    flat = jnp.where(is_diag, jnp.inf, energy).reshape(-1)
    thresh = jnp.sort(flat)[::-1][keep_n - 1]
    keep = (jnp.where(is_diag, jnp.inf, energy) >= thresh) | is_diag
    mask = jnp.broadcast_to(keep[:, None, :, None],
                            (n_bm, bm, n_bn, bn))
    return mask.reshape(three_h, h).astype(wh.dtype)


def sparsify_gru_a(params: LPCNetParams, density: float,
                   block=(16, 32)) -> LPCNetParams:
    """Apply the magnitude block mask to GRU_A's recurrent weights."""
    mask = gru_a_block_mask(params.gru_a.wh, density, block)
    return params._replace(
        gru_a=params.gru_a._replace(wh=params.gru_a.wh * mask))


def sparsity_schedule(step: int, start: int, end: int,
                      final_density: float) -> float:
    """LPCNet-style cubic ramp from dense to final_density over
    [start, end] training steps."""
    if step <= start or final_density >= 1.0:
        return 1.0
    if step >= end:
        return final_density
    frac = (step - start) / max(end - start, 1)
    return final_density + (1.0 - final_density) * (1.0 - frac) ** 3
