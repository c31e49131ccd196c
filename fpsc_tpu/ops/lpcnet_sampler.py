"""Fused Pallas TPU kernel for LPCNet autoregressive sampling.

Why: the XLA lax.scan sampler costs ~10.3 us/step (the ~35 ops of the
sample loop each pay HBM round-trips / op overhead).  This kernel fuses
the ENTIRE sample step with all state and weights in VMEM: 4.4 us/step
at batch 128 on v5e = 1802x aggregate real-time (the step is
dependency-latency-bound, not MXU-rate-bound - bf16 vs f32 weights
differ by only ~2%).

Layout: everything is FEATURE-MAJOR - batch lives on the 128-wide lane
dimension (B=128 fills exactly one lane tile), features on sublanes.
Consequences:

* per-sample scalars are (1, B) rows that broadcast along sublanes for
  free,
* all dynamic time indexing (uniform draws, output writes) happens on
  the sublane dimension, which Mosaic allows (lane indexing must be
  128-aligned),
* GRU matmuls are W (3H, H) @ h (H, B) with every dimension a multiple
  of 128 (for the production GRU_A 384/1152),
* the three mu-law embeddings are gathered with (E, 256) @ one-hot
  (256, B) matmuls (TPU has no vector gather) and hit the input weight
  as one (3H, 3E) matmul - measured faster than BOTH single-matmul
  consolidations: the (3H, 768) product table (round 1) and the
  (3E, 768) block-diagonal embedding (round 2: 12-13% slower at
  batch 128; the 3x MAC growth costs more than the saved op issues),
* the sampling CDF is a log-step roll cumsum on the VPU at NARROW
  batch (b <= 128); at wide batch the kernel switches to a
  lower-triangular-ones matmul riding the otherwise-idle MXU
  (`cdf_matmul`, default-on for b > 128 — see draw()); mu-law decode
  is a masked diff-row reduction.

Chain-shortening variants measured NEGATIVE on v5e at batch 128
(dense baseline 1930-1950x the day of measurement; all were exact
f32-reorderings verified bit-identical in interpret mode first):

* carried x/e embedding contribution + (3H, 256) pred-path product
  table: 1471x - the (3Ha, B) f32 loop carry spills vector registers,
* fused [W_h_a; W_i_b] @ h_a with carried recurrent half: 1708x - the
  big matmul moves onto the sampling-feedback critical path,
* fused [W_h_b; W_fc] @ h_b: 1926x (flat to slightly negative),
* bf16 prefix-sum (static slice+zero-concat shifts; Mosaic has no
  sub-32-bit rotate): 1861x - the concat copies cost more than the
  halved VPU traffic saves.

Block-sparse GRU_A saturates ~2150x: diag-only (64, 64) patterns
(16.7% live) and (64, 128) at 33% live both hit ~2150x, while
(32, 32) blocks at 10% live DROP to ~2008x (per-block op overhead
exceeds the saved MACs).  The remaining step time is distributed
across op-issue overhead and the serial sample feedback, not any
single removable op.

Grid = one step per 10 ms frame (sequential); frame-rate inputs
(conditioning contributions, LPC, sharpening temperature, uniforms)
stream in per-frame via BlockSpecs; GRU states / LPC history persist
across frames in VMEM scratch.  Matmuls run in bf16 with f32
accumulation by default (dtype switchable to f32 for parity tests).

Functional contract matches fpsc_tpu.models.lpcnet.generate (same
uniforms -> same samples, modulo matmul precision).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpsc_tpu.dsp import constants as C

_LOG256 = float(np.log(256.0))
_MU_SCALE = 255.0 / 32768.0


def _l2u_rows(v):
    """mu-law index of linear [-1, 1) samples; (1, B) -> (1, B) f32."""
    x = v * 32768.0
    s = jnp.sign(x)
    u = s * (128.0 * jnp.log1p(_MU_SCALE * jnp.abs(x)) / _LOG256)
    return jnp.clip(jnp.round(128.0 + u), 0.0, 255.0)


def _kernel(cond_a_ref, cond_b_ref, lpc_ref, temp_ref, u_ref,
            emb_ref, wiemb_ref, wh_a_ref, bh_a_ref, wi_b_ref,
            wh_b_ref, bh_b_ref,
            fc1_ref, fc1b_ref, u2l_ref, *refs,
            ha: int, hb: int, levels: int, deemph: float,
            u2l_base: float, acc_dtype, gru_a_pattern=None,
            sparse_block=(128, 128), bunch: int = 1,
            w8: bool = False, cdf_matmul: bool = False):
    if bunch in (2, 4):
        # sub-sample head dual FCs: bunch=2 -> stacked (2*levels,
        # hb + 2E); bunch=4 -> three per-position blocks stacked
        # row-wise as (6*levels, hb + 3E), block s-1 = [fc3_s; fc4_s]
        fch_ref, fchb_ref = refs[0], refs[1]
        refs = refs[2:]
    if w8:
        # int8 weight-only storage: every matmul weight arrives as i8
        # with a per-output-row f32 scale; the kernel converts i8 ->
        # acc_dtype feeding each matmul (Mosaic accepts the convert;
        # i8 ELEMENTWISE ops are still rejected, so nothing else
        # touches the i8 values) and applies the scale to the matmul
        # OUTPUT rows - (R, B) elements instead of (R, C), and the
        # scale multiply stays exact f32.
        n_s = 7 if bunch in (2, 4) else 6
        (s_emb, s_wiemb, s_wha, s_wib, s_whb, s_fc1), sfch = \
            refs[:6], (refs[6] if n_s == 7 else None)
        refs = refs[n_s:]
    if cdf_matmul:
        # lower-triangular ones, precomputed host-side (an in-kernel
        # iota build costs ~3x the VMEM transiently and pushed b768
        # over the compile cliff): the CDF prefix-sum becomes TRI @ p
        # on the MXU, which sits idle during the serial sampling
        # tail.  TRI is exact in bf16, so the f32 3-pass
        # decomposition's products are exact (tri_lo = 0) and only
        # the summation ORDER differs from the log-step scan - the
        # same "modulo matmul precision" class the functional
        # contract already allows.  Probe (scripts/probe_draw_tail.py
        # at b768): roll-scan 1.36 us/draw net -> matmul 0.15 us.
        tri_ref = refs[0]
        refs = refs[1:]
    out_ref, h_a_s, h_b_s, hist_s = refs
    f = pl.program_id(0)
    b = h_a_s.shape[1]

    @pl.when(f == 0)
    def _init():
        h_a_s[:] = jnp.zeros_like(h_a_s)
        h_b_s[:] = jnp.zeros_like(h_b_s)
        hist_s[:] = jnp.zeros_like(hist_s)

    cond_a = cond_a_ref[0]          # (3Ha, B), input bias folded
    cond_b = cond_b_ref[0]          # (3Hb, B), input bias folded
    lpc_rev = lpc_ref[0]            # (16, B) f32, reversed coeff order
    temp = temp_ref[0]              # (1, B) f32 sharpening temperature
    iota_lvl = jax.lax.broadcasted_iota(jnp.int32, (levels, b), 0)

    def wdot(w_ref, x, s_ref):
        """Weight @ activation with optional int8 dequant: i8 weights
        convert to acc_dtype feeding the MXU, per-row scales apply to
        the (R, B) output."""
        w = w_ref[:].astype(acc_dtype) if w8 else w_ref[:]
        y = jnp.dot(w, x, preferred_element_type=jnp.float32)
        return y * s_ref[:] if w8 else y

    def emb_of(idx_rows):
        """mu-law embedding via one-hot matmul: (1, B) -> (E, B)."""
        return wdot(
            emb_ref,
            (iota_lvl == idx_rows.astype(jnp.int32)).astype(acc_dtype),
            s_emb if w8 else None)

    def emb_many(rows):
        """n mu-law embeddings in ONE matmul: the n (256, B) one-hots
        concatenate on the LANE dimension and hit the embedding table
        as a single (E, 256) @ (256, nB) product, then split back per
        128-lane block.  Exact same per-column dot products as n
        separate emb_of calls (checksum-identical).  A/B on v5e at
        batch 128: +3.8% on the bunched kernel (7 gathers/pair; the
        per-gather ablation put each separate chain at ~0.5 us) and
        +1.8% dense, but -7% on the SPARSE unbunched path (the
        batched gather schedules worse against the block-sparse
        matmul sequence) - so only the bunch=2 step uses it."""
        if b != 128:
            # the (E, nB) -> n x (E, B) lane split below requires
            # 128-aligned column offsets (Mosaic: "offset mismatch on
            # non-concat dimension" otherwise) - small batches fall
            # back to per-gather matmuls.  b > 128 also falls back:
            # the n*b-lane concat crashes the Mosaic backend at
            # b = 256 (remote compile helper exit 1, batch-scaling
            # probe), and the trick's +3.8% was measured at exactly
            # one lane tile - per-gather matmuls at b tiles keep the
            # MXU fed anyway.
            return [emb_of(r) for r in rows]
        oh = jnp.concatenate(
            [(iota_lvl == r.astype(jnp.int32)).astype(acc_dtype)
             for r in rows], axis=1)                    # (256, nB)
        em = wdot(emb_ref, oh, s_emb if w8 else None)   # (E, nB)
        return [em[:, k * b:(k + 1) * b] for k in range(len(rows))]

    def gates(pre, gh, h, width):
        # exact f32 nonlinearities (bf16 and Pade-approx variants were
        # measured: no win on this part, so keep fidelity)
        r = jax.nn.sigmoid(pre[:width] + gh[:width])
        z = jax.nn.sigmoid(pre[width:2 * width] + gh[width:2 * width])
        n = jnp.tanh(pre[2 * width:] + r * gh[2 * width:])
        return (1.0 - z) * n + z * h

    def recurrent_a(h_a):
        if gru_a_pattern is None:
            return wdot(wh_a_ref, h_a.astype(acc_dtype),
                        s_wha if w8 else None)
        # static block-sparse recurrent matmul: only the live
        # (rb, cb) blocks of W_h are computed (the pattern comes
        # from lpcnet.sparsify_gru_a-style training)
        rb_sz, cb_sz = sparse_block
        h16 = h_a.astype(acc_dtype)
        rows = []
        for rb, cols in enumerate(gru_a_pattern):
            acc = jnp.zeros((rb_sz, b), jnp.float32)
            for cb in cols:
                w_blk = wh_a_ref[rb * rb_sz:(rb + 1) * rb_sz,
                                 cb * cb_sz:(cb + 1) * cb_sz]
                if w8:
                    w_blk = w_blk.astype(acc_dtype)
                acc = acc + jnp.dot(
                    w_blk, h16[cb * cb_sz:(cb + 1) * cb_sz],
                    preferred_element_type=jnp.float32)
            if w8:
                # per-row scale applies AFTER the column-block sum
                acc = acc * s_wha[rb * rb_sz:(rb + 1) * rb_sz]
            rows.append(acc)
        return jnp.concatenate(rows, axis=0)

    def draw(fcpre, u_t):
        """Sampling tail: stacked dual-FC pre-activations + uniform ->
        linear excitation (1, B)."""
        logits = (jnp.tanh(fcpre[:levels])
                  + jnp.tanh(fcpre[levels:]))                 # (256, B)
        # logits in [-2, 2] and temp clipped small: exp never overflows,
        # so the usual max-subtraction is skipped.  The 0.002 tail cut
        # acts on NORMALISED probs; scale it by Z instead of dividing:
        # max(p/Z - c, 0) has the same argcdf as max(p - c*Z, 0).
        # NARROW batch (b <= 128): sampling runs on the VPU — the
        # log-step roll cumsum + sublane reductions measured ~7%
        # faster than the triangular matmul there (transfer-free
        # timing).  WIDE batch flips that verdict: the VPU passes
        # scale with batch while the MXU sits idle during the
        # sampling tail, so cdf_matmul (default-on for b > 128) does
        # the prefix sum as TRI @ p — 1.36 -> 0.15 us/draw at b768
        # (scripts/probe_draw_tail.py).  Both regimes are measured;
        # neither branch should be removed on the other's numbers.
        # exp in acc_dtype shaves the (256, B) transcendental traffic.
        p = jnp.exp((logits * temp).astype(acc_dtype)).astype(jnp.float32)
        z = jnp.sum(p, axis=0, keepdims=True)
        pcut = jnp.maximum(p - 0.002 * z, 0.0)
        if cdf_matmul:
            cdf = jnp.dot(tri_ref[:], pcut,
                          preferred_element_type=jnp.float32)
        else:
            cdf = pcut
            k = 1
            while k < levels:
                cdf = cdf + jnp.where(iota_lvl >= k,
                                      pltpu.roll(cdf, k, 0), 0.0)
                k *= 2
        # total = last prefix-sum row (NOT a separate reduction): keeps
        # the cdf < u*total decision scale-coherent with cdf, so both
        # samplers flip identically; also one fewer reduction per step.
        total = cdf[levels - 1:levels]
        thresh = u_t * total
        below = (cdf < thresh).astype(jnp.float32)            # (256, B)
        return jnp.sum(below * u2l_ref[:], axis=0,
                       keepdims=True) + u2l_base

    def gru_chain(e_cat, h_a, h_b):
        """GRU_A -> GRU_B -> stacked head-1 pre-activations."""
        pre_a = wdot(wiemb_ref, e_cat, s_wiemb if w8 else None) + cond_a
        gh_a = recurrent_a(h_a) + bh_a_ref[:]
        h_a = gates(pre_a, gh_a, h_a, ha)
        pre_b = wdot(wi_b_ref, h_a.astype(acc_dtype),
                     s_wib if w8 else None) + cond_b
        gh_b = wdot(wh_b_ref, h_b.astype(acc_dtype),
                    s_whb if w8 else None) + bh_b_ref[:]
        h_b = gates(pre_b, gh_b, h_b, hb)
        # merged dual FC: one (2*levels, Hb) matmul, split + tanh + add
        fcpre = wdot(fc1_ref, h_b.astype(acc_dtype),
                     s_fc1 if w8 else None) + fc1b_ref[:]
        return h_a, h_b, fcpre

    def step(t, carry):
        h_a, h_b, hist, prev_e, prev_y = carry
        pred = -jnp.sum(hist * lpc_rev, axis=0, keepdims=True)  # (1,B)
        e_cat = jnp.concatenate([
            emb_of(_l2u_rows(hist[15:16])),
            emb_of(_l2u_rows(prev_e)),
            emb_of(_l2u_rows(pred)),
        ], axis=0).astype(acc_dtype)                          # (3E, B)
        h_a, h_b, fcpre = gru_chain(e_cat, h_a, h_b)
        e_lin = draw(fcpre, u_ref[0, pl.ds(t, 1), :])
        sample = pred + e_lin
        hist = jnp.concatenate([hist[1:], sample], axis=0)
        y = sample + deemph * prev_y
        out_ref[0, pl.ds(t, 1), :] = y
        return h_a, h_b, hist, e_lin, y

    def step2(t, carry):
        """Bunched pair step: one GRU chain, two sampled excitations
        (models/lpcnet_bunched.py semantics)."""
        h_a, h_b, hist, e_p2, e_p1, prev_y = carry
        pred1 = -jnp.sum(hist * lpc_rev, axis=0, keepdims=True)
        e_cat = jnp.concatenate(emb_many([
            _l2u_rows(hist[14:15]),
            _l2u_rows(hist[15:16]),
            _l2u_rows(e_p2),
            _l2u_rows(e_p1),
            _l2u_rows(pred1),
        ]), axis=0).astype(acc_dtype)                         # (5E, B)
        h_a, h_b, fcpre1 = gru_chain(e_cat, h_a, h_b)
        e1 = draw(fcpre1, u_ref[0, pl.ds(2 * t, 1), :])
        x1 = pred1 + e1
        hist = jnp.concatenate([hist[1:], x1], axis=0)
        pred2 = -jnp.sum(hist * lpc_rev, axis=0, keepdims=True)
        emb_x1, emb_p2 = emb_many([_l2u_rows(x1), _l2u_rows(pred2)])
        h2in = jnp.concatenate([
            h_b.astype(acc_dtype),
            emb_x1.astype(acc_dtype),
            emb_p2.astype(acc_dtype),
        ], axis=0)                                            # (hb+2E, B)
        fcpre2 = wdot(fch_ref, h2in,
                      sfch if w8 else None) + fchb_ref[:]
        e2 = draw(fcpre2, u_ref[0, pl.ds(2 * t + 1, 1), :])
        x2 = pred2 + e2
        hist = jnp.concatenate([hist[1:], x2], axis=0)
        y1 = x1 + deemph * prev_y
        y2 = x2 + deemph * y1
        if b > 128:
            # multi-row dynamic sublane stores at non-8-aligned
            # offsets fail Mosaic's alignment prover once the batch
            # spans >1 lane tile ("cannot statically prove that index
            # in dimension 1 is a multiple of 8"); single-row stores
            # compile at any offset, so wide batches store per row
            out_ref[0, pl.ds(2 * t, 1), :] = y1
            out_ref[0, pl.ds(2 * t + 1, 1), :] = y2
        else:
            out_ref[0, pl.ds(2 * t, 2), :] = jnp.concatenate(
                [y1, y2], axis=0)
        return h_a, h_b, hist, e1, e2, y2

    def step4(t, carry):
        """Bunch-4 step: one GRU chain, four sampled excitations
        (models/lpcnet_bunched.py Bunched4Params semantics)."""
        h_a, h_b, hist, e_hist, prev_y = carry      # e_hist (4, B)
        pred = -jnp.sum(hist * lpc_rev, axis=0, keepdims=True)
        e_cat = jnp.concatenate(emb_many(
            [_l2u_rows(hist[12 + s:13 + s]) for s in range(4)]
            + [_l2u_rows(e_hist[s:s + 1]) for s in range(4)]
            + [_l2u_rows(pred)]), axis=0).astype(acc_dtype)  # (9E, B)
        h_a, h_b, fcpre1 = gru_chain(e_cat, h_a, h_b)
        es = []
        ys = []
        y_prev = prev_y
        for s in range(4):
            if s == 0:
                fcpre = fcpre1
            else:
                pred = -jnp.sum(hist * lpc_rev, axis=0, keepdims=True)
                xp1, xp2, pp = emb_many([
                    _l2u_rows(hist[15:16]), _l2u_rows(hist[14:15]),
                    _l2u_rows(pred)])
                h2in = jnp.concatenate([
                    h_b.astype(acc_dtype), xp1.astype(acc_dtype),
                    xp2.astype(acc_dtype), pp.astype(acc_dtype)],
                    axis=0)                         # (hb+3E, B)
                r0 = (s - 1) * 2 * levels
                w_h = fch_ref[r0:r0 + 2 * levels]
                if w8:
                    w_h = w_h.astype(acc_dtype)
                fcpre = jnp.dot(
                    w_h, h2in,
                    preferred_element_type=jnp.float32)
                if w8:
                    fcpre = fcpre * sfch[r0:r0 + 2 * levels]
                fcpre = fcpre + fchb_ref[r0:r0 + 2 * levels]
            e_s = draw(fcpre, u_ref[0, pl.ds(4 * t + s, 1), :])
            x_s = pred + e_s
            hist = jnp.concatenate([hist[1:], x_s], axis=0)
            y_s = x_s + deemph * y_prev
            y_prev = y_s
            es.append(e_s)
            ys.append(y_s)
        if b > 128:
            # same >1-lane-tile store-alignment constraint as step2
            for s in range(4):
                out_ref[0, pl.ds(4 * t + s, 1), :] = ys[s]
        else:
            out_ref[0, pl.ds(4 * t, 4), :] = jnp.concatenate(ys, axis=0)
        return h_a, h_b, hist, jnp.concatenate(es, axis=0), y_prev

    if bunch == 1:
        h_a, h_b, hist, prev_e, prev_y = jax.lax.fori_loop(
            0, C.FRAME_SIZE, step,
            (h_a_s[:ha], h_b_s[:hb], hist_s[:16],
             hist_s[16:17], hist_s[17:18]))
        h_a_s[:ha] = h_a
        h_b_s[:hb] = h_b
        hist_s[:16] = hist
        hist_s[16:17] = prev_e
        hist_s[17:18] = prev_y
    elif bunch == 2:
        h_a, h_b, hist, e_p2, e_p1, prev_y = jax.lax.fori_loop(
            0, C.FRAME_SIZE // 2, step2,
            (h_a_s[:ha], h_b_s[:hb], hist_s[:16],
             hist_s[16:17], hist_s[17:18], hist_s[18:19]))
        h_a_s[:ha] = h_a
        h_b_s[:hb] = h_b
        hist_s[:16] = hist
        hist_s[16:17] = e_p2
        hist_s[17:18] = e_p1
        hist_s[18:19] = prev_y
    else:
        h_a, h_b, hist, e_hist, prev_y = jax.lax.fori_loop(
            0, C.FRAME_SIZE // 4, step4,
            (h_a_s[:ha], h_b_s[:hb], hist_s[:16],
             hist_s[16:20], hist_s[20:21]))
        h_a_s[:ha] = h_a
        h_b_s[:hb] = h_b
        hist_s[:16] = hist
        hist_s[16:20] = e_hist
        hist_s[20:21] = prev_y


def quantize_rows_int8(w):
    """Symmetric per-output-row int8 quantisation of a (R, C) weight.

    Returns (q int8 (R, C), scale f32 (R, 1)) with w ~= q * scale.
    Rows are output channels, so each row's full dynamic range maps
    onto [-127, 127] independently - the standard weight-only scheme
    (the reference's own deployment practice is 8-bit LPCNet C
    inference, reference README.md:36-40).  jit-safe (shape-static).
    """
    a = jnp.max(jnp.abs(w), axis=1, keepdims=True)
    s = jnp.where(a > 0, a, 1.0) / 127.0
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def dequantize_rows_int8(q, s):
    """Exact float view of quantize_rows_int8 output (test oracle)."""
    return q.astype(jnp.float32) * s


def derive_block_pattern(wh, block=(128, 128)):
    """Static live-block pattern of a (3H, H) recurrent matrix.

    Returns (pattern, block) where pattern[rb] is the tuple of live
    column-block indices for row-block rb.  Block dims shrink to the
    largest power-of-two divisors that fit the matrix.
    """
    wh = np.asarray(wh)
    three_h, h = wh.shape
    rb_sz, cb_sz = block
    rb_sz = min(rb_sz, three_h)
    while three_h % rb_sz:
        rb_sz //= 2
    cb_sz = min(cb_sz, h)
    while h % cb_sz:
        cb_sz //= 2
    blocks = wh.reshape(three_h // rb_sz, rb_sz, h // cb_sz, cb_sz)
    live = np.abs(blocks).sum((1, 3)) > 0
    pattern = tuple(tuple(int(c) for c in np.nonzero(row)[0])
                    for row in live)
    return pattern, (rb_sz, cb_sz)


def auto_block_pattern(params, block=(64, 64), max_live: float = 0.9):
    """Derive the kernel's static block pattern from TRAINED weights.

    Returns (pattern, block) when GRU_A's recurrent matrix is actually
    block-sparse (live fraction < max_live), else None (dense path).
    Lets synthesis entries deploy the sparse kernel automatically for
    models trained with lpcnet.sparsify_gru_a; must run OUTSIDE jit.
    Accepts LPCNetParams or BunchedParams."""
    params = getattr(params, "base", params)
    pattern, blk = derive_block_pattern(params.gru_a.wh, block)
    wh = np.asarray(params.gru_a.wh)
    total = len(pattern) * (wh.shape[1] // blk[1])
    live = sum(len(c) for c in pattern)
    return (pattern, blk) if live < max_live * total else None


class _SamplerMeta:
    """Static (compile-time) configuration of one prepared sampler
    call: everything pallas_sample needs to rebuild the kernel and
    its BlockSpecs.  Hashable on its field tuple so a jitted
    pallas_sample closure re-traces only when the static config
    actually changes."""

    __slots__ = ("ha", "hb", "levels", "b", "b_pad", "length",
                 "bunch", "pattern", "sparse_block", "w8",
                 "use_cdf_mm", "deemphasis", "u2l_base", "dtype",
                 "bunched")

    def __init__(self, **kw):
        for k in self.__slots__:
            setattr(self, k, kw[k])

    def _key(self):
        return tuple(getattr(self, k) for k in self.__slots__)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return (isinstance(other, _SamplerMeta)
                and self._key() == other._key())


def pallas_prepare(params, feat: jax.Array, periods: jax.Array,
                   lpc: jax.Array, key: jax.Array,
                   corr: Optional[jax.Array] = None,
                   deemphasis: float = 0.85,
                   dtype=jnp.bfloat16,
                   gru_a_pattern=None,
                   weights_int8: bool = False,
                   cdf_matmul: Optional[bool] = None):
    """Frame-rate PROLOGUE of the fused sampler, as its own program:
    the conditioning network (frame_net + the folded GRU input
    matmuls), uniform draws, weight casting/quantisation and the
    feature-major transposes.  Returns (operands, meta) for
    pallas_sample.

    Split out (round 5) so serving code can dispatch batch k+1's
    conditioning while batch k's sampling kernel is in flight, and so
    the prologue/kernel cost split is measurable
    (scripts/probe_overlap.py).  pallas_generate(a, ...) ==
    pallas_sample(*pallas_prepare(a, ...)) exactly — same operands,
    same kernel."""
    from fpsc_tpu.models.lpcnet import frame_net

    bunched = hasattr(params, "base")      # BunchedParams / Bunched4
    if bunched:
        head2 = params
        # Bunched4Params stacks three position heads row-wise
        bunch = (4 if params.fc3.w.shape[0]
                 == 3 * params.base.fc1.w.shape[0] else 2)
        params = params.base
    else:
        head2, bunch = None, 1
    n_emb = 2 * bunch + 1                  # embeddings into GRU_A

    b, length, _ = feat.shape
    levels = params.sample_emb.table.shape[0]
    ha = params.gru_a.units
    hb = params.gru_b.units
    e_dim = params.sample_emb.table.shape[1]
    if corr is None:
        # raw-scale corr, clipped to the physical correlation range
        # (keeps temp <= 1.25: the kernel's exp-overflow-skip bound)
        corr = jnp.clip(feat[..., 19] * C.MAXI, -0.5, 0.5)

    cond = frame_net(params, feat, periods)
    emb = params.sample_emb.table
    wi_a = params.gru_a.wi
    hp = jax.lax.Precision.HIGHEST
    cond_a = jnp.matmul(cond, wi_a[:, n_emb * e_dim:].T,
                        precision=hp) + params.gru_a.bi    # (B, L, 3Ha)
    wi_b = params.gru_b.wi
    cond_b = jnp.matmul(cond, wi_b[:, ha:].T,
                        precision=hp) + params.gru_b.bi    # (B, L, 3Hb)

    # batch pads onto the lane dimension
    b_pad = max(8, -(-b // 8) * 8)
    def to_fmajor(x):
        """(B, L, F) -> (L, F, B_pad)"""
        x = jnp.transpose(x, (1, 2, 0))
        if b != b_pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, b_pad - b)))
        return x

    # canonical (L, B, 160) stream shared with the XLA sampler
    uniforms = jax.random.uniform(key, (length, b, C.FRAME_SIZE),
                                  jnp.float32)
    uniforms = jnp.transpose(uniforms, (0, 2, 1))
    if b != b_pad:
        uniforms = jnp.pad(uniforms, ((0, 0), (0, 0), (0, b_pad - b)))

    # no upper clamp: reference src/train.py:81 (matches lpcnet.generate)
    gamma = jnp.maximum(1.5 * corr - 0.5, 0.0)
    temps = to_fmajor((1.0 + gamma)[..., None])
    lpc_rev = to_fmajor(lpc[..., ::-1])
    cond_a_s = to_fmajor(cond_a)
    cond_b_s = to_fmajor(cond_b)

    # u2l forward diffs u2l[k+1]-u2l[k] as one aligned row; the
    # constant base u2l[0] is baked into the kernel.
    # pure-numpy mu-law table (jit-safe: these are compile-time consts)
    _u = np.arange(levels, dtype=np.float64) - 128.0
    u2l_vals = (np.sign(_u) * (32768.0 / 255.0)
                * (np.exp(np.abs(_u) / 128.0 * _LOG256) - 1.0)) / 32768.0
    u2l_col = jnp.asarray(np.concatenate(
        [u2l_vals[1:] - u2l_vals[:-1], [0.0]])[:, None], jnp.float32)
    u2l_base = float(u2l_vals[0])
    fc_w = jnp.concatenate([params.fc1.w, params.fc2.w], axis=0)
    fc_b = jnp.concatenate([params.fc1.b, params.fc2.b])[:, None]

    scales = []
    if weights_int8:
        emb_t_op, s_emb = quantize_rows_int8(emb.T)
        wiemb_op, s_wiemb = quantize_rows_int8(wi_a[:, :n_emb * e_dim])
        wha_op, s_wha = quantize_rows_int8(params.gru_a.wh)
        wib_op, s_wib = quantize_rows_int8(params.gru_b.wi[:, :ha])
        whb_op, s_whb = quantize_rows_int8(params.gru_b.wh)
        fcw_op, s_fcw = quantize_rows_int8(fc_w)
        scales = [s_emb, s_wiemb, s_wha, s_wib, s_whb, s_fcw]
    else:
        emb_t_op = emb.T.astype(dtype)
        wiemb_op = wi_a[:, :n_emb * e_dim].astype(dtype)
        wha_op = params.gru_a.wh.astype(dtype)
        wib_op = params.gru_b.wi[:, :ha].astype(dtype)
        whb_op = params.gru_b.wh.astype(dtype)
        fcw_op = fc_w.astype(dtype)

    if gru_a_pattern is not None:
        pattern, sparse_block = gru_a_pattern
    else:
        pattern, sparse_block = None, (128, 128)

    use_cdf_mm = b > 128 if cdf_matmul is None else cdf_matmul

    operands = [
        cond_a_s.astype(dtype), cond_b_s.astype(dtype),
        lpc_rev, temps, uniforms,
        emb_t_op, wiemb_op,
        wha_op,
        params.gru_a.bh[:, None],
        wib_op,
        whb_op, params.gru_b.bh[:, None],
        fcw_op, fc_b,
        u2l_col,
    ]
    if bunched:
        if bunch == 2:
            fch_w = jnp.concatenate([head2.fc3.w, head2.fc4.w], axis=0)
            fch_b = jnp.concatenate([head2.fc3.b, head2.fc4.b])
        else:
            # interleave per position: block s-1 = [fc3_s; fc4_s]
            wblocks, bblocks = [], []
            for s in range(3):
                r = slice(s * levels, (s + 1) * levels)
                wblocks += [head2.fc3.w[r], head2.fc4.w[r]]
                bblocks += [head2.fc3.b[r], head2.fc4.b[r]]
            fch_w = jnp.concatenate(wblocks, axis=0)
            fch_b = jnp.concatenate(bblocks)
        if weights_int8:
            fch_op, s_fch = quantize_rows_int8(fch_w)
            scales.append(s_fch)
        else:
            fch_op = fch_w.astype(dtype)
        operands += [fch_op, fch_b[:, None]]
    if weights_int8:
        operands += scales
    if use_cdf_mm:
        operands += [jnp.asarray(np.tril(
            np.ones((levels, levels), np.float32)))]

    meta = _SamplerMeta(
        ha=ha, hb=hb, levels=levels, b=b, b_pad=b_pad, length=length,
        bunch=bunch, pattern=pattern, sparse_block=sparse_block,
        w8=weights_int8, use_cdf_mm=use_cdf_mm, deemphasis=deemphasis,
        u2l_base=u2l_base, dtype=dtype, bunched=bunched)
    return operands, meta


def pallas_sample(operands, meta: _SamplerMeta,
                  interpret: bool = False) -> jax.Array:
    """KERNEL half of the fused sampler: runs the pallas_call on
    operands produced by pallas_prepare.  (B, L*160) output, exactly
    pallas_generate's."""
    b, b_pad, length = meta.b, meta.b_pad, meta.length
    kernel = functools.partial(
        _kernel, ha=meta.ha, hb=meta.hb, levels=meta.levels,
        deemph=meta.deemphasis, u2l_base=meta.u2l_base,
        acc_dtype=meta.dtype, gru_a_pattern=meta.pattern,
        sparse_block=meta.sparse_block, bunch=meta.bunch,
        w8=meta.w8, cdf_matmul=meta.use_cdf_mm)

    frame_spec = lambda rows: pl.BlockSpec(
        (1, rows, b_pad), lambda f: (f, 0, 0), memory_space=pltpu.VMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        frame_spec(3 * meta.ha),   # cond_a
        frame_spec(3 * meta.hb),   # cond_b
        frame_spec(16),            # lpc
        frame_spec(1),             # temp
        frame_spec(C.FRAME_SIZE),  # uniforms
        vmem, vmem, vmem, vmem,    # emb_t wi_emb wh_a bh_a
        vmem, vmem, vmem,          # wi_b wh_b bh_b
        vmem, vmem, vmem,          # fc_w fc_b u2l
    ]
    # bunched heads / int8 scales / cdf TRI: all plain VMEM operands
    in_specs += [vmem] * (len(operands) - len(in_specs))

    out = pl.pallas_call(
        kernel,
        grid=(length,),
        in_specs=in_specs,
        out_specs=frame_spec(C.FRAME_SIZE),
        out_shape=jax.ShapeDtypeStruct(
            (length, C.FRAME_SIZE, b_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((meta.ha, b_pad), jnp.float32),
            pltpu.VMEM((max(meta.hb, 8), b_pad), jnp.float32),
            pltpu.VMEM((24, b_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*operands)
    # (L, 160, B) -> (B, T)
    y = out[:, :, :b].reshape(length * C.FRAME_SIZE, b)
    return jnp.transpose(y, (1, 0))


def pallas_generate(params, feat: jax.Array, periods: jax.Array,
                    lpc: jax.Array, key: jax.Array,
                    corr: Optional[jax.Array] = None,
                    deemphasis: float = 0.85,
                    dtype=jnp.bfloat16,
                    gru_a_pattern=None,
                    weights_int8: bool = False,
                    cdf_matmul: Optional[bool] = None,
                    interpret: bool = False) -> jax.Array:
    """Drop-in replacement for lpcnet.generate using the fused kernel.

    feat (B, L, 20), periods (B, L) int, lpc (B, L, 16) -> (B, L*160).

    gru_a_pattern: optional (pattern, (rb, cb)) from
    derive_block_pattern(params.gru_a.wh) - the static live-block map
    of GRU_A's recurrent matrix (produced by lpcnet.sparsify_gru_a
    training); the kernel then skips the dead blocks' MXU work.  Must
    be derived OUTSIDE jit (it inspects concrete weights) and passed
    in; it is a static compile-time argument.

    corr semantics match lpcnet.generate: RAW-scale pitch correlation;
    the default un-normalises feat[..., 19] by MAXI (feat is expected
    MAXI-normalised per the vocoder training convention).

    Accepts either lpcnet.LPCNetParams (bunch=1, one sample per
    recurrent step) or lpcnet_bunched.BunchedParams (bunch=2, one
    recurrent step per PAIR of samples - models/lpcnet_bunched.py).

    weights_int8: store every sample-rate matmul weight (mu-law
    embedding, GRU_A input+recurrent, GRU_B, dual FCs, bunched heads)
    in VMEM as int8 with per-output-row f32 scales, dequantising
    in-kernel at each use (the reference's deployed quantized
    inference practice, reference README.md:36-40).  Halves the
    persistent weight footprint; biases, conditioning and all
    activations stay f32/bf16.  Composes with gru_a_pattern and all
    bunch modes.

    cdf_matmul: compute the sampling CDF as a lower-triangular-ones
    matmul on the MXU instead of the 8-pass log-step roll scan on the
    VPU.  The MXU is idle during the serial sampling tail, so this is
    nearly free where the VPU passes scale with batch; measured net
    cumsum cost per draw at batch 768 drops 1.36 -> 0.15 us
    (scripts/probe_draw_tail.py).  Only the summation order changes
    (TRI is exact in bf16, so every product is exact).  Default None =
    auto: on for wide batches (b > 128), off at narrow batch where
    the roll scan measured faster (kernel header notes).
    """
    ops, meta = pallas_prepare(
        params, feat, periods, lpc, key, corr=corr,
        deemphasis=deemphasis, dtype=dtype,
        gru_a_pattern=gru_a_pattern, weights_int8=weights_int8,
        cdf_matmul=cdf_matmul)
    return pallas_sample(ops, meta, interpret=interpret)
