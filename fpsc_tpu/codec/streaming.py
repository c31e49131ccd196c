"""Stateful frame-at-a-time codec for real-time serving.

The batch codec (fpsc_tpu.codec.codec) processes whole utterances as
scans; serving needs a 10 ms-frame streaming loop with persistent
state.  These classes wrap jitted single-frame steps:

  StreamingFrontend.process_block(160 PCM samples) -> feat20 row
  StreamingEncoder.encode_frame(feat20) -> per-frame symbols
  StreamingDecoder.decode_frame(symbols' residual, pitch) -> coded frame
  StreamingVocoder.synthesize_frame(coded frame) -> 160 samples

StreamingCodec fuses the full-duplex loop into ONE compiled program
per 10 ms tick — from features (process_frame) or, with
from_pcm=True, from RAW microphone PCM (process_pcm: analysis
frontend -> encode -> decode -> synthesize, one dispatch round trip
end to end; the analysis window's one-block lookahead means tick k
codes frame k-1).

State (GRU carries, previous coded frame, vocoder sample history) lives
on-device between calls; each call is one compiled program.  The
streaming path is bit-identical to the batch scan (tested).

MULTI-STREAM SERVING: every class takes `batch=N` and then carries N
independent streams' states stacked on the leading axis — one
dispatched program serves N sessions per 10 ms tick.  Per-call
dispatch latency dominates single-stream serving on a tunneled device
(scripts/bench_streaming.py measures it), and the per-step compute is
batch-independent (fpsc-perf round-1 finding), so batching streams is
nearly free throughput.
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


def _rows(feat_rows: np.ndarray, batch: int, dim: int) -> jnp.ndarray:
    """Accept (dim,) for batch=1 or (batch, dim)."""
    a = jnp.asarray(feat_rows, jnp.float32)
    if a.ndim == 1:
        a = a[None]
    assert a.shape == (batch, dim), (a.shape, batch, dim)
    return a


def _split_symbols(p, n_vq: int, n_vq_bl: int):
    """THE packed symbol-row layout, shared by every unpacker (host
    numpy and on-device jax alike): columns [coded(20) | ind1 | ind2 |
    scl | scl_bl | vq(S) | vq_bl(S')].  Returns (symbol dict,
    consumed width) so trailing payloads (e.g. StreamingCodec's 160
    audio samples) slice from the returned offset.  _encoder_step's
    pack is the single producer of this layout."""
    s, sb = n_vq, n_vq_bl
    out = {
        "coded": p[:, :20],
        "ind1": p[:, 20] > 0.5,
        "ind2": p[:, 21] > 0.5,
        "indices": {
            "scl": p[:, 22].astype(np.int32),
            "scl_bl": p[:, 23].astype(np.int32),
            "vq": p[:, 24:24 + s].astype(np.int32),
            "vq_bl": p[:, 24 + s:24 + s + sb].astype(np.int32),
        },
    }
    return out, 24 + s + sb


def _frontend_step(preemph: float = 0.85):
    """Pure per-block analysis: (state, pcm (B, 160) RAW samples) ->
    (state, feat (B, 20) normalised [ceps|pitch]).

    State is (ring (B, 576) pre-emphasised history, last_raw (B,)).
    The 320-sample analysis window of frame t spans [160t, 160t+320),
    i.e. one block of LOOKAHEAD: the tick that receives block k emits
    frame k-1 (10 ms algorithmic latency, standard for this window).
    After block k the ring holds pre-emphasised samples
    [160(k+1)-576, 160(k+1)) — exactly frame k-1's pitch context in
    dsp/frontend.estimate_pitch_jnp (the batch path), so per-frame
    features match the batch extractor frame-for-frame; the (B, 576)
    ring IS a correlation slab (`_slab_corr_table` batches over its
    leading axis either way).  Tick 0's output is a warmup frame
    (half-filled window) — callers discard it."""
    from fpsc_tpu.dsp import frontend as fe

    def step(state, pcm_rows):
        ring, last_raw = state
        prev = jnp.concatenate([last_raw[:, None], pcm_rows[:, :-1]],
                               axis=1)
        y = pcm_rows - jnp.float32(preemph) * prev
        ring = jnp.concatenate([ring[:, C.FRAME_SIZE:], y], axis=1)
        ceps = fe.frames_to_cepstra(ring[:, -C.WINDOW_SIZE:])
        pitch = fe._pitch_from_corr_table(fe._slab_corr_table(ring))
        feat = jnp.concatenate([ceps, pitch], axis=1) / C.MAXI
        return (ring, pcm_rows[:, -1]), feat

    return step


class StreamingFrontend:
    """On-device streaming analysis: 10 ms PCM blocks in, normalised
    [ceps|pitch] feature rows out, batched over independent streams.
    Completes the serving chain's input side (the batch counterpart is
    dsp/frontend.extract_features)."""

    def __init__(self, preemph: float = 0.85, batch: int = 1):
        self.batch = batch
        self.reset()
        self._step = jax.jit(_frontend_step(preemph))

    def reset(self):
        b = self.batch
        from fpsc_tpu.dsp.frontend import PITCH_MAX
        self.state = (
            jnp.zeros((b, PITCH_MAX + C.WINDOW_SIZE)),
            jnp.zeros((b,)),
        )

    def process_block(self, pcm_rows: np.ndarray) -> np.ndarray:
        """pcm_rows (160,)/(batch, 160) RAW samples -> (20,)/(B, 20)
        normalised features for frame k-1 (one warmup tick)."""
        squeeze = np.ndim(pcm_rows) == 1
        self.state, feat = self._step(
            self.state, _rows(pcm_rows, self.batch, C.FRAME_SIZE))
        feat = np.asarray(feat)
        return feat[0] if squeeze and self.batch == 1 else feat


def _encoder_step(params: fp.FramePredictorParams,
                  codebooks: fp.Codebooks, l1: float, l2: float):
    """Pure per-frame encode: (state, feat (B, 20)) -> (state, packed).

    packed is ONE (B, 24+S+S') f32 row [coded(20) | ind1 | ind2 | scl
    | scl_bl | vq(S) | vq_bl(S')]: on a tunneled device every host
    pull is a network round trip, so per-frame results travel as a
    single array and are split on the host."""
    def step(state, feat_rows):
        h1, h2, prev = state
        x = jnp.concatenate([prev, feat_rows[:, 18:]], axis=-1)
        f_out, h1, h2 = fp.step(params, h1, h2, x)
        r_s = feat_rows[:, :18] - f_out
        ind1 = jnp.abs(r_s[:, 0]) > l1
        ind2 = jnp.sum(jnp.abs(r_s[:, 1:]), axis=-1) > l2
        r_qtz, indices = fp._quantize_residual(codebooks, r_s,
                                               ind1, ind2)
        prev = f_out + r_qtz
        coded = jnp.concatenate([prev, feat_rows[:, 18:]], axis=-1)
        packed = jnp.concatenate([
            coded,                                    # 20
            ind1[:, None].astype(jnp.float32),        # 1
            ind2[:, None].astype(jnp.float32),        # 1
            indices["scl"][:, None].astype(jnp.float32),
            indices["scl_bl"][:, None].astype(jnp.float32),
            indices["vq"].astype(jnp.float32),        # S
            indices["vq_bl"].astype(jnp.float32),     # S'
        ], axis=-1)
        return (h1, h2, prev), packed

    return step


class StreamingEncoder:
    def __init__(self, params: fp.FramePredictorParams,
                 codebooks: fp.Codebooks, l1: float = 0.09,
                 l2: float = 0.28, batch: int = 1):
        self.params = params
        self.codebooks = codebooks
        self.batch = batch
        self.reset()
        self._n_vq = len(codebooks.vq)
        self._n_vq_bl = (len(codebooks.vq_bl)
                         if codebooks.vq_bl is not None else 1)
        self._step = jax.jit(_encoder_step(params, codebooks, l1, l2))

    def reset(self):
        b = self.batch
        self.state = (
            jnp.zeros((b, self.params.rnn1.units)),
            jnp.zeros((b, self.params.rnn2.units)),
            jnp.zeros((b, fp.NB_CEPS)),
        )

    def encode_frame(self, feat_rows: np.ndarray) -> Dict:
        """feat_rows: (20,) or (batch, 20) normalised [ceps|pitch]."""
        squeeze = np.ndim(feat_rows) == 1
        self.state, packed = self._step(
            self.state, _rows(feat_rows, self.batch, 20))
        p = np.asarray(packed)                 # single host transfer
        out, _ = _split_symbols(p, self._n_vq, self._n_vq_bl)
        if squeeze and self.batch == 1:
            out = jax.tree_util.tree_map(lambda a: a[0], out)
        return out


def _decoder_step(params: fp.FramePredictorParams,
                  codebooks: fp.Codebooks):
    """Pure per-frame decode: (state, ind1, ind2, indices, pitch (B,2))
    -> (state, coded (B, 20))."""
    def step(state, ind1, ind2, indices, pitch_rows):
        h1, h2, prev = state
        r_qtz = _dequant_frame(codebooks, ind1, ind2, indices)
        x = jnp.concatenate([prev, pitch_rows], axis=-1)
        f_out, h1, h2 = fp.step(params, h1, h2, x)
        coded = f_out + r_qtz
        return (h1, h2, coded), jnp.concatenate(
            [coded, pitch_rows], axis=-1)

    return step


class StreamingDecoder:
    def __init__(self, params: fp.FramePredictorParams,
                 codebooks: fp.Codebooks, batch: int = 1):
        self.params = params
        self.codebooks = codebooks
        self.batch = batch
        self.reset()
        self._step = jax.jit(_decoder_step(params, codebooks))

    def reset(self):
        b = self.batch
        self.state = (
            jnp.zeros((b, self.params.rnn1.units)),
            jnp.zeros((b, self.params.rnn2.units)),
            jnp.zeros((b, fp.NB_CEPS)),
        )

    def decode_frame(self, ind1, ind2, indices: Dict,
                     pitch_rows: np.ndarray) -> np.ndarray:
        """-> (20,) / (batch, 20) normalised coded frame."""
        squeeze = np.ndim(pitch_rows) == 1
        ind1 = jnp.atleast_1d(jnp.asarray(ind1, bool))
        ind2 = jnp.atleast_1d(jnp.asarray(ind2, bool))
        idx = {k: jnp.asarray(np.atleast_2d(np.asarray(v))
                              if k in ("vq", "vq_bl")
                              else np.atleast_1d(np.asarray(v)))
               for k, v in indices.items()}
        self.state, coded = self._step(
            self.state, ind1, ind2, idx,
            _rows(pitch_rows, self.batch, 2))
        coded = np.asarray(coded)
        return coded[0] if squeeze and self.batch == 1 else coded


def _vocoder_step(params: lpcnet.LPCNetParams):
    """Pure per-frame synthesis: (state, key, coded (B, 20)) ->
    (state, samples (B, 160))."""
    def frame_step(state, key, coded_rows):
            h_a, h_b, hist, prev_e, prev_y = state
            b = coded_rows.shape[0]
            feat = coded_rows[:, None, :20]
            # coded rows are MAXI-normalised; the period formula and
            # the sampling sharpening operate on RAW-scale pitch
            # (reference src/train.py:123 and :79-92), matching the
            # batch path (train_lpcnet.vocoder_inputs).
            period = (0.1 + 50.0 * coded_rows[:, 18] * C.MAXI + 100.0
                      ).astype(jnp.int32)[:, None]
            cond = lpcnet.frame_net(params, feat, period)[:, 0]  # (B, C)
            from fpsc_tpu.dsp.ceps2lpc import ceps2lpc
            _, lpc, _ = ceps2lpc(coded_rows[:, :18] * C.MAXI)
            lpc_rev = lpc[:, ::-1]
            corr = jnp.clip(coded_rows[:, 19] * C.MAXI, -0.5, 0.5)
            uniforms = jax.random.uniform(key, (C.FRAME_SIZE, b, 1))
            emb = params.sample_emb.table
            from fpsc_tpu.dsp.mulaw import l2u_index, u2l
            u2l_table = u2l(jnp.arange(256)) / 32768.0
            gamma = jnp.maximum(1.5 * corr - 0.5, 0.0)[:, None]

            def sample_step(carry, u):
                h_a, h_b, hist, prev_e, prev_y = carry
                pred = -jnp.sum(hist * lpc_rev, axis=-1)
                pre = jnp.concatenate([
                    emb[l2u_index(hist[:, -1] * 32768.0)],
                    emb[l2u_index(prev_e * 32768.0)],
                    emb[l2u_index(pred * 32768.0)],
                    cond], axis=-1)
                h_a = gru_step(params.gru_a, h_a, pre)
                h_b = gru_step(params.gru_b, h_b, jnp.concatenate(
                    [h_a, cond], axis=-1))
                logits = lpcnet._logits(params, h_b)
                p = jnp.exp(logits * (1.0 + gamma))
                z = jnp.sum(p, axis=-1, keepdims=True)
                pcut = jnp.maximum(p - 0.002 * z, 0.0)
                cdf = jnp.cumsum(pcut, axis=-1)
                e_idx = jnp.sum(
                    (cdf < u * cdf[:, -1:]).astype(jnp.int32), axis=-1)
                e_lin = u2l_table[e_idx]
                sample = pred + e_lin
                hist = jnp.concatenate([hist[:, 1:], sample[:, None]], 1)
                y = sample + 0.85 * prev_y
                return (h_a, h_b, hist, e_lin, y), y

            state, ys = jax.lax.scan(
                sample_step, (h_a, h_b, hist, prev_e, prev_y), uniforms)
            return state, jnp.swapaxes(ys, 0, 1)        # (B, 160)

    return frame_step


class StreamingVocoder:
    """LPCNet sampler, one 10 ms frame (160 samples) per call, batched
    over independent streams."""

    def __init__(self, params: lpcnet.LPCNetParams, seed: int = 0,
                 batch: int = 1):
        self.params = params
        self.key = jax.random.PRNGKey(seed)
        self.batch = batch
        self.reset()
        self._step = jax.jit(_vocoder_step(params))

    def reset(self):
        b = self.batch
        self.state = (
            jnp.zeros((b, self.params.gru_a.units)),
            jnp.zeros((b, self.params.gru_b.units)),
            jnp.zeros((b, C.LPC_ORDER)),
            jnp.zeros((b,)),
            jnp.zeros((b,)),
        )

    def synthesize_frame(self, coded_rows: np.ndarray) -> np.ndarray:
        """coded_rows: (20,) / (batch, 20) -> (160,) / (batch, 160)."""
        squeeze = np.ndim(coded_rows) == 1
        self.key, sub = jax.random.split(self.key)
        self.state, ys = self._step(
            self.state, sub, _rows(coded_rows, self.batch, 20))
        ys = np.asarray(ys)
        return ys[0] if squeeze and self.batch == 1 else ys


def _dequant_frame(codebooks: fp.Codebooks, ind1, ind2, indices):
    """One frame's residual from its index rows (B-batched)."""
    from fpsc_tpu.quant.scalar import scl_dequantize
    from fpsc_tpu.quant.vq import vq_dequantize

    safe = lambda i: jnp.maximum(i, 0)
    r0_a = scl_dequantize(safe(indices["scl"]), codebooks.scl)
    r0_b = (scl_dequantize(safe(indices["scl_bl"]), codebooks.scl_bl)
            if codebooks.scl_bl is not None
            else jnp.zeros_like(r0_a))
    r0 = jnp.where(ind1, r0_a, r0_b)
    rv_a = jax.vmap(lambda i: vq_dequantize(safe(i), codebooks.vq))(
        jnp.atleast_2d(indices["vq"]))
    rv_b = (jax.vmap(lambda i: vq_dequantize(safe(i),
                                             codebooks.vq_bl))(
        jnp.atleast_2d(indices["vq_bl"]))
        if codebooks.vq_bl is not None
        else jnp.zeros_like(rv_a))
    rv = jnp.where(ind2[:, None], rv_a, rv_b)
    return jnp.concatenate([r0[:, None], rv], axis=-1)


def _conceal_decoder_step(params: fp.FramePredictorParams,
                          codebooks: fp.Codebooks,
                          fade_after: int = 3,
                          fade_step: float = 0.012,
                          freeze: bool = False,
                          fec_codebooks: fp.Codebooks = None,
                          damp: float = 0.0,
                          energy_cap: bool = True):
    """Per-frame decode with erasure concealment (the streaming twin
    of codec/plc.conceal_decode — same policy, same arithmetic):
    (state, ind1, ind2, indices, pitch (B,2), lost (B,)) ->
    (state, coded (B, 20)).  State adds (prev_pitch, loss run) to the
    plain decoder's carry.  With `fec_codebooks`, two extra inputs
    (fec_indices, from_fec) select the lean-layout redundancy residual
    per frame (codec/plc.fec_merge_residual, in-program)."""
    def step(state, ind1, ind2, indices, pitch_rows, lost,
             fec_indices=None, from_fec=None):
        h1, h2, prev, prev_pitch, run = state
        r_qtz = _dequant_frame(codebooks, ind1, ind2, indices)
        if fec_codebooks is not None:
            r_fec = _dequant_frame(fec_codebooks, ind1, ind2,
                                   fec_indices)
            r_qtz = jnp.where(from_fec[:, None], r_fec, r_qtz)

        keep = 1.0 - lost.astype(jnp.float32)
        pit = jnp.where(lost[:, None], prev_pitch, pitch_rows)
        x = jnp.concatenate([prev, pit], axis=-1)
        f_out, h1, h2 = fp.step(params, h1, h2, x)
        run = (run + 1.0) * (1.0 - keep)
        att = jnp.maximum(run - float(fade_after), 0.0) * fade_step
        alpha = float(damp) ** jnp.maximum(run - 1.0, 0.0)
        f_con = alpha[:, None] * f_out + (1.0 - alpha)[:, None] * prev
        if energy_cap:
            f_con = f_con.at[:, 0].set(
                jnp.minimum(f_con[:, 0], prev[:, 0]))
        coded = jnp.where(lost[:, None], f_con,
                          f_out + r_qtz * keep[:, None])
        if freeze:
            coded = jnp.where(lost[:, None], prev, coded)
        coded = coded.at[:, 0].add(-att)
        return ((h1, h2, coded, pit, run),
                jnp.concatenate([coded, pit], axis=-1))

    return step


class StreamingReceiver:
    """The far-end serving component: transmitted symbols (or a LOST
    flag) in, 160 synthesized samples out, ONE compiled program and
    ONE device round trip per 10 ms tick, batched over independent
    sessions.

    Pairs with range_coder.pack_packets/StreamingRangeDecoder on the
    transport side: when a packet never arrives, call
    process_symbols(..., lost=True) for its frames with placeholder
    rows — the concealment policy of codec/plc.conceal_decode
    (predictor free-run, pitch hold, c0 fade past `fade_after`
    consecutive losses) runs inside the fused tick."""

    def __init__(self, enc_params: fp.FramePredictorParams,
                 codebooks: fp.Codebooks,
                 voc_params: lpcnet.LPCNetParams,
                 seed: int = 0, batch: int = 1,
                 fade_after: int = 3, fade_step: float = 0.012,
                 fec_codebooks: fp.Codebooks = None,
                 damp: float = 0.0, energy_cap: bool = True):
        self.batch = batch
        self.key = jax.random.PRNGKey(seed)
        self._enc_params = enc_params
        self._voc_params = voc_params
        self._fec = fec_codebooks is not None
        if self._fec:
            self._fec_placeholder = {
                "scl": -1, "scl_bl": -1,
                "vq": [-1] * len(fec_codebooks.vq),
                "vq_bl": [-1] * (len(fec_codebooks.vq_bl)
                                 if fec_codebooks.vq_bl is not None
                                 else 1)}
        self.reset()
        dec = _conceal_decoder_step(enc_params, codebooks,
                                    fade_after, fade_step,
                                    fec_codebooks=fec_codebooks,
                                    damp=damp, energy_cap=energy_cap)
        voc = _vocoder_step(voc_params)

        def tick(dec_state, voc_state, key, ind1, ind2, indices,
                 pitch_rows, lost, *fec):
            dec_state, coded = dec(dec_state, ind1, ind2, indices,
                                   pitch_rows, lost, *fec)
            voc_state, ys = voc(voc_state, key, coded[:, :20])
            return dec_state, voc_state, jnp.concatenate(
                [coded, ys], axis=-1)

        self._tick = jax.jit(tick)

    def reset(self):
        b, ep, vp = self.batch, self._enc_params, self._voc_params
        self.dec_state = (jnp.zeros((b, ep.rnn1.units)),
                          jnp.zeros((b, ep.rnn2.units)),
                          jnp.zeros((b, fp.NB_CEPS)),
                          jnp.zeros((b, 2)),
                          jnp.zeros((b,)))
        self.voc_state = (jnp.zeros((b, vp.gru_a.units)),
                          jnp.zeros((b, vp.gru_b.units)),
                          jnp.zeros((b, C.LPC_ORDER)),
                          jnp.zeros((b,)), jnp.zeros((b,)))

    def process_symbols(self, ind1, ind2, indices: Dict,
                        pitch_rows: np.ndarray, lost=False,
                        fec_indices: Dict = None,
                        from_fec=False) -> Dict:
        """One frame per session; `lost` is a bool or (batch,) bools —
        True frames ignore their symbol/pitch rows (pass placeholders).
        With fec_codebooks constructed, `fec_indices`/`from_fec` route
        frames recovered from redundancy (range_coder.FecPacketReceiver
        emits both layouts).  Returns {'coded' (B, 20), 'audio'
        (B, 160)} (squeezed for batch=1 scalar input)."""
        def lift_idx(d):
            return {k: jnp.asarray(np.atleast_2d(np.asarray(v))
                                   if k in ("vq", "vq_bl")
                                   else np.atleast_1d(np.asarray(v)))
                    for k, v in d.items()}

        squeeze = np.ndim(pitch_rows) == 1
        ind1 = jnp.atleast_1d(jnp.asarray(ind1, bool))
        ind2 = jnp.atleast_1d(jnp.asarray(ind2, bool))
        lost = jnp.broadcast_to(
            jnp.atleast_1d(jnp.asarray(lost, bool)), (self.batch,))
        idx = lift_idx(indices)
        fec = ()
        if self._fec:
            fec = (lift_idx(fec_indices if fec_indices is not None
                            else self._fec_placeholder),
                   jnp.broadcast_to(
                       jnp.atleast_1d(jnp.asarray(from_fec, bool)),
                       (self.batch,)))
        self.key, sub = jax.random.split(self.key)
        self.dec_state, self.voc_state, out = self._tick(
            self.dec_state, self.voc_state, sub, ind1, ind2, idx,
            _rows(pitch_rows, self.batch, 2), lost, *fec)
        p = np.asarray(out)                    # single host transfer
        res = {"coded": p[:, :20], "audio": p[:, 20:]}
        if squeeze and self.batch == 1:
            res = {k: v[0] for k, v in res.items()}
        return res


class StreamingTransmitter:
    """Encoder-only serving tick: raw microphone PCM in, transmitted
    symbols out, ONE compiled program and ONE device round trip per
    10 ms tick, batched over independent streams.

    The transmit side of a deployment (mic -> analysis frontend ->
    closed-loop predictor encode -> symbol rows; the entropy layer
    rides the host CPU next to it, codec/native_rc.py) previously ran
    as the per-stage StreamingFrontend + StreamingEncoder chain — two
    dispatch round trips per tick where the receiver (`Streaming
    Receiver`) and duplex (`StreamingCodec`) ticks pay one.  This
    class fuses the same two pure steps (_frontend_step +
    _encoder_step — shared code, so parity with the per-stage chain
    is exact by construction and pinned in tests/test_streaming.py).

    The frontend's one-block lookahead applies: the tick that
    receives PCM block k emits frame k-1's symbols; tick 0's output
    is an analysis-warmup frame — callers discard it.  Matches the
    reference's encode path (src/generate_qtz_features.py:49-72) run
    as a serving loop."""

    def __init__(self, enc_params: fp.FramePredictorParams,
                 codebooks: fp.Codebooks, l1: float = 0.09,
                 l2: float = 0.28, batch: int = 1,
                 preemph: float = 0.85):
        self.batch = batch
        self._enc_params = enc_params
        self._n_vq = len(codebooks.vq)
        self._n_vq_bl = (len(codebooks.vq_bl)
                         if codebooks.vq_bl is not None else 1)
        self.reset()
        front = _frontend_step(preemph)
        enc = _encoder_step(enc_params, codebooks, l1, l2)

        def tick(front_state, enc_state, pcm_rows):
            front_state, feat_rows = front(front_state, pcm_rows)
            enc_state, packed = enc(enc_state, feat_rows)
            return front_state, enc_state, packed

        self._tick = jax.jit(tick)

    def reset(self):
        b, ep = self.batch, self._enc_params
        from fpsc_tpu.dsp.frontend import PITCH_MAX
        self.front_state = (
            jnp.zeros((b, PITCH_MAX + C.WINDOW_SIZE)),
            jnp.zeros((b,)))
        self.enc_state = (jnp.zeros((b, ep.rnn1.units)),
                          jnp.zeros((b, ep.rnn2.units)),
                          jnp.zeros((b, fp.NB_CEPS)))

    def process_pcm(self, pcm_rows: np.ndarray) -> Dict:
        """RAW 10 ms PCM block (160,)/(batch, 160) -> frame k-1's
        symbol dict {'coded', 'ind1', 'ind2', 'indices'} (tick 0 is
        warmup — discard)."""
        squeeze = np.ndim(pcm_rows) == 1
        self.front_state, self.enc_state, packed = self._tick(
            self.front_state, self.enc_state,
            _rows(pcm_rows, self.batch, C.FRAME_SIZE))
        p = np.asarray(packed)                 # single host transfer
        out, _ = _split_symbols(p, self._n_vq, self._n_vq_bl)
        if squeeze and self.batch == 1:
            out = jax.tree_util.tree_map(lambda a: a[0], out)
        return out


class StreamingCodec:
    """Fused full-duplex tick: encode -> decode -> synthesize in ONE
    compiled program and ONE device round trip.

    The three-stage chain pays one dispatch round trip per stage per
    10 ms tick; on a tunneled device that is ~35 ms each (VALIDATION's
    serving table), so the loopback chain (speech in -> symbols ->
    coded features -> speech out, e.g. codec-in-the-loop training
    data, server-side transcoding, or local monitoring) runs 3x
    faster dispatched as one program.  The per-tick result is a
    single packed (B, 24+S+S'+160) array: encoder symbols followed by
    the 160 decoded-and-resynthesised samples."""

    def __init__(self, enc_params: fp.FramePredictorParams,
                 codebooks: fp.Codebooks,
                 voc_params: lpcnet.LPCNetParams,
                 l1: float = 0.09, l2: float = 0.28,
                 seed: int = 0, batch: int = 1,
                 from_pcm: bool = False, preemph: float = 0.85):
        self.batch = batch
        self.key = jax.random.PRNGKey(seed)
        self._n_vq = len(codebooks.vq)
        self._n_vq_bl = (len(codebooks.vq_bl)
                         if codebooks.vq_bl is not None else 1)
        self._enc_params = enc_params
        self._voc_params = voc_params
        self.from_pcm = from_pcm
        self.reset()

        enc = _encoder_step(enc_params, codebooks, l1, l2)
        dec = _decoder_step(enc_params, codebooks)
        voc = _vocoder_step(voc_params)
        s, sb = self._n_vq, self._n_vq_bl

        def chain(enc_state, dec_state, voc_state, key, feat_rows):
            enc_state, packed = enc(enc_state, feat_rows)
            # re-materialise the symbol dict ON DEVICE (the decoder
            # consumes exactly what a receiver would unpack)
            sym, _ = _split_symbols(packed, s, sb)
            dec_state, coded = dec(dec_state, sym["ind1"], sym["ind2"],
                                   sym["indices"], feat_rows[:, 18:])
            voc_state, ys = voc(voc_state, key, coded[:, :20])
            out = jnp.concatenate([packed, ys], axis=-1)
            return enc_state, dec_state, voc_state, out

        if from_pcm:
            front = _frontend_step(preemph)

            def tick(front_state, enc_state, dec_state, voc_state,
                     key, pcm_rows):
                # mic PCM -> features -> symbols -> coded -> speech,
                # still ONE compiled program and ONE round trip; the
                # frontend's one-block lookahead means tick k codes
                # frame k-1 (discard the tick-0 warmup output)
                front_state, feat_rows = front(front_state, pcm_rows)
                enc_state, dec_state, voc_state, out = chain(
                    enc_state, dec_state, voc_state, key, feat_rows)
                return front_state, enc_state, dec_state, voc_state, out

            self._tick_pcm = jax.jit(tick)
        else:
            self._tick = jax.jit(chain)

    def reset(self):
        b = self.batch
        ep, vp = self._enc_params, self._voc_params
        self.enc_state = (jnp.zeros((b, ep.rnn1.units)),
                          jnp.zeros((b, ep.rnn2.units)),
                          jnp.zeros((b, fp.NB_CEPS)))
        self.dec_state = (jnp.zeros((b, ep.rnn1.units)),
                          jnp.zeros((b, ep.rnn2.units)),
                          jnp.zeros((b, fp.NB_CEPS)))
        self.voc_state = (jnp.zeros((b, vp.gru_a.units)),
                          jnp.zeros((b, vp.gru_b.units)),
                          jnp.zeros((b, C.LPC_ORDER)),
                          jnp.zeros((b,)), jnp.zeros((b,)))
        if getattr(self, "from_pcm", False):
            from fpsc_tpu.dsp.frontend import PITCH_MAX
            self.front_state = (
                jnp.zeros((b, PITCH_MAX + C.WINDOW_SIZE)),
                jnp.zeros((b,)))

    def process_frame(self, feat_rows: np.ndarray) -> Dict:
        """feat_rows (20,)/(batch, 20) normalised [ceps|pitch] ->
        {'indices', 'ind1', 'ind2', 'coded', 'audio' (160,)/(B, 160)}
        in one device call."""
        squeeze = np.ndim(feat_rows) == 1
        self.key, sub = jax.random.split(self.key)
        (self.enc_state, self.dec_state, self.voc_state,
         out) = self._tick(self.enc_state, self.dec_state,
                           self.voc_state, sub,
                           _rows(feat_rows, self.batch, 20))
        p = np.asarray(out)                    # single host transfer
        res, width = _split_symbols(p, self._n_vq, self._n_vq_bl)
        res["audio"] = p[:, width:]
        if squeeze and self.batch == 1:
            res = jax.tree_util.tree_map(lambda a: a[0], res)
        return res

    def process_pcm(self, pcm_rows: np.ndarray) -> Dict:
        """RAW 10 ms PCM block (160,)/(batch, 160) -> the same result
        dict as process_frame, for frame k-1 (requires
        from_pcm=True; tick 0 is analysis warmup — discard it).
        The full duplex loop (mic -> features -> symbols -> coded ->
        speech) runs as ONE compiled program per tick."""
        assert self.from_pcm, "construct StreamingCodec(from_pcm=True)"
        squeeze = np.ndim(pcm_rows) == 1
        self.key, sub = jax.random.split(self.key)
        (self.front_state, self.enc_state, self.dec_state,
         self.voc_state, out) = self._tick_pcm(
            self.front_state, self.enc_state, self.dec_state,
            self.voc_state, sub,
            _rows(pcm_rows, self.batch, C.FRAME_SIZE))
        p = np.asarray(out)                    # single host transfer
        res, width = _split_symbols(p, self._n_vq, self._n_vq_bl)
        res["audio"] = p[:, width:]
        if squeeze and self.batch == 1:
            res = jax.tree_util.tree_map(lambda a: a[0], res)
        return res
