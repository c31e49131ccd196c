"""Streaming codec parity with batch scans; range coder round-trips."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpsc_tpu.codec import range_coder as rc
from fpsc_tpu.codec.codec import encode
from fpsc_tpu.models import frame_predictor as fp

RNG = np.random.RandomState(71)


@pytest.fixture(scope="module")
def setup():
    cfg = fp.FramePredictorConfig(gru_units1=24, gru_units2=12)
    params = fp.init_frame_predictor(jax.random.PRNGKey(3), cfg)
    r = np.random.RandomState(5)
    cbs = fp.Codebooks(
        scl=jnp.asarray(np.sort(r.randn(8)).astype(np.float32) * 0.1),
        vq=(jnp.asarray(r.randn(16, 17).astype(np.float32) * 0.1),),
        scl_bl=jnp.asarray(np.sort(r.randn(4)).astype(np.float32) * 0.02),
        vq_bl=(jnp.asarray(r.randn(8, 17).astype(np.float32) * 0.02),),
    )
    feat = (RNG.randn(1, 12, 20) * 0.3).astype(np.float32)
    return params, cbs, feat


def test_streaming_encoder_matches_batch(setup):
    from fpsc_tpu.codec.streaming import StreamingEncoder
    params, cbs, feat = setup
    batch = encode(params, cbs, jnp.asarray(feat))
    senc = StreamingEncoder(params, cbs)
    for t in range(feat.shape[1]):
        out = senc.encode_frame(feat[0, t])
        assert bool(out["ind1"]) == bool(np.asarray(batch["ind1"])[0, t])
        np.testing.assert_allclose(
            out["coded"], np.asarray(batch["coded"])[0, t],
            rtol=1e-5, atol=1e-6)
        for k in ("scl", "vq"):
            np.testing.assert_array_equal(
                out["indices"][k], np.asarray(batch["indices"][k])[0, t])


def test_streaming_decoder_matches_encoder(setup):
    from fpsc_tpu.codec.streaming import (StreamingDecoder,
                                          StreamingEncoder)
    params, cbs, feat = setup
    senc = StreamingEncoder(params, cbs)
    sdec = StreamingDecoder(params, cbs)
    for t in range(feat.shape[1]):
        out = senc.encode_frame(feat[0, t])
        coded = sdec.decode_frame(out["ind1"], out["ind2"],
                                  out["indices"], feat[0, t, 18:])
        np.testing.assert_allclose(coded, out["coded"],
                                   rtol=1e-5, atol=1e-6)


def test_streaming_vocoder_runs(setup):
    from fpsc_tpu.codec.streaming import StreamingVocoder
    from fpsc_tpu.models import lpcnet
    params, cbs, feat = setup
    lcfg = lpcnet.LPCNetConfig(gru_a_units=16, gru_b_units=8,
                               embed_dim=8, cond_units=8)
    voc = StreamingVocoder(lpcnet.init_lpcnet(jax.random.PRNGKey(1),
                                              lcfg))
    y1 = voc.synthesize_frame(feat[0, 0])
    y2 = voc.synthesize_frame(feat[0, 1])
    assert y1.shape == (160,) and np.isfinite(y1).all()
    assert not np.array_equal(y1, y2)


def test_batched_streaming_matches_independent_streams(setup):
    """batch=N streaming carries N independent sessions: results equal
    N separate single-stream instances, stream for stream."""
    from fpsc_tpu.codec.streaming import StreamingEncoder
    params, cbs, _ = setup
    rng = np.random.RandomState(5)
    feats = (rng.randn(3, 6, 20) * 0.3).astype(np.float32)

    benc = StreamingEncoder(params, cbs, batch=3)
    singles = [StreamingEncoder(params, cbs) for _ in range(3)]
    for t in range(6):
        out_b = benc.encode_frame(feats[:, t])
        for i in range(3):
            out_s = singles[i].encode_frame(feats[i, t])
            assert bool(out_b["ind1"][i]) == bool(out_s["ind1"])
            np.testing.assert_allclose(out_b["coded"][i], out_s["coded"],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_array_equal(out_b["indices"]["vq"][i],
                                          out_s["indices"]["vq"])


def test_batched_streaming_vocoder(setup):
    from fpsc_tpu.codec.streaming import StreamingVocoder
    from fpsc_tpu.models import lpcnet
    params, cbs, feat = setup
    lcfg = lpcnet.LPCNetConfig(gru_a_units=16, gru_b_units=8,
                               embed_dim=8, cond_units=8)
    voc = StreamingVocoder(lpcnet.init_lpcnet(jax.random.PRNGKey(1),
                                              lcfg), batch=4)
    rows = (np.random.RandomState(2).randn(4, 20) * 0.3
            ).astype(np.float32)
    y = voc.synthesize_frame(rows)
    assert y.shape == (4, 160) and np.isfinite(y).all()
    # distinct streams -> distinct audio
    assert not np.array_equal(y[0], y[1])


def test_streaming_decoder_batched_roundtrip(setup):
    from fpsc_tpu.codec.streaming import (StreamingDecoder,
                                          StreamingEncoder)
    params, cbs, _ = setup
    rng = np.random.RandomState(8)
    feats = (rng.randn(2, 5, 20) * 0.3).astype(np.float32)
    enc = StreamingEncoder(params, cbs, batch=2)
    dec = StreamingDecoder(params, cbs, batch=2)
    for t in range(5):
        out = enc.encode_frame(feats[:, t])
        coded = dec.decode_frame(out["ind1"], out["ind2"],
                                 out["indices"], feats[:, t, 18:])
        np.testing.assert_allclose(coded, out["coded"],
                                   rtol=1e-5, atol=1e-6)


def test_range_coder_roundtrip_random_symbols():
    rng = np.random.RandomState(0)
    counts = rng.randint(1, 100, 32)
    table = rc.FreqTable(counts)
    syms = rng.randint(0, 32, 500)
    enc = rc.RangeEncoder()
    for s in syms:
        enc.encode(table, int(s))
    data = enc.finish()
    dec = rc.RangeDecoder(data)
    got = [dec.decode(table) for _ in syms]
    np.testing.assert_array_equal(got, syms)


def test_range_coder_near_entropy():
    """A skewed source must code near its entropy, well below fixed
    width."""
    rng = np.random.RandomState(1)
    probs = np.array([0.85, 0.05, 0.04, 0.03, 0.01, 0.01, 0.005, 0.005])
    n = 4000
    syms = rng.choice(8, size=n, p=probs)
    table = rc.FreqTable(probs * 1e6)
    enc = rc.RangeEncoder()
    for s in syms:
        enc.encode(table, int(s))
    bits = len(enc.finish()) * 8
    h = -np.sum(probs * np.log2(probs))
    assert bits / n < h * 1.1 + 0.1     # within 10% of entropy
    assert bits / n < 3.0               # far below the 3-bit fixed width


def test_pack_utterance_rc_roundtrip_and_rate(setup):
    """Self-contained entropy-coded utterance (pitch included, adaptive
    models, no side info): exact roundtrip and a measured rate beneath
    the fixed-layout bitstream on the same symbol streams."""
    from fpsc_tpu.codec import bitstream as bs
    from fpsc_tpu.train.generate_qtz_features import codebook_sizes

    params, cbs, _ = setup
    sizes = codebook_sizes(cbs)
    rng = np.random.RandomState(9)
    feat = (rng.randn(1, 120, 20) * 0.3).astype(np.float32)
    # realistic raw-scale pitch: smooth period track + corr in range
    period = 110 + np.cumsum(rng.randint(-2, 3, 120))
    feat[0, :, 18] = (np.clip(period, 40, 250) - 100.0) / 50.0
    feat[0, :, 19] = np.clip(0.3 + 0.1 * rng.randn(120), -0.5, 0.5)

    enc = encode(params, cbs, jnp.asarray(feat))
    ind1 = np.asarray(enc["ind1"])[0]
    ind2 = np.asarray(enc["ind2"])[0]
    indices = {k: np.asarray(v)[0] for k, v in enc["indices"].items()}
    pitch = feat[0, :, 18:]
    pcodes = bs.quantize_pitch(pitch)

    data = rc.pack_utterance_rc(ind1, ind2, indices, pcodes, sizes)
    got = rc.unpack_utterance_rc(data, sizes)
    np.testing.assert_array_equal(got["ind1"], ind1)
    np.testing.assert_array_equal(got["ind2"], ind2)
    for k in ("scl", "vq", "scl_bl", "vq_bl"):
        want = np.atleast_2d(indices[k].T).T
        mask = want >= 0
        np.testing.assert_array_equal(
            np.atleast_2d(got["indices"][k].T).T[mask], want[mask])
    np.testing.assert_allclose(got["pitch"],
                               bs.dequantize_pitch(pcodes), rtol=1e-6)

    fixed = bs.pack_utterance(ind1, ind2, indices, pitch, sizes)
    rate_rc = bs.bitrate_bps(len(data), 120)
    rate_fx = bs.bitrate_bps(len(fixed), 120)
    # the pitch delta model alone should undercut the fixed 11 bits/
    # frame side-channel decisively
    assert rate_rc < 0.85 * rate_fx, (rate_rc, rate_fx)


def test_stage_conditioning_and_priors_reduce_rate():
    """On streams with (a) stage-1 indices statistically coupled to
    stage-0's context bucket and (b) a skewed stationary usage
    distribution, the conditioned models + shared priors must code
    measurably below the round-2 coder's order-0 adaptive tables.
    (The round-2 rate is emulated here by an unconditioned
    AdaptiveFreqTable walk over the same streams.)"""
    rng = np.random.RandomState(5)
    sizes = {"scl": 16, "scl_bl": 0, "vq": [64, 64], "vq_bl": []}
    length = 600
    ind1 = np.ones(length, bool)
    ind2 = np.ones(length, bool)
    # stage-0: skewed usage; stage-1: depends on stage-0's bucket
    i0 = rng.zipf(1.5, length).clip(1, 64) - 1
    bucket = i0 >> 4
    i1 = (bucket * 16 + rng.zipf(1.6, length).clip(1, 16) - 1)
    idx = {"scl": rng.randint(16, size=length),
           "scl_bl": np.full(length, -1),
           "vq": np.stack([i0, i1], 1).astype(np.int64),
           "vq_bl": np.full((length, 1), -1)}
    pitch = np.stack([np.full(length, 1.0),
                      np.full(length, 0.3)], 1)
    from fpsc_tpu.codec import bitstream as bs
    pcodes = bs.quantize_pitch(pitch)

    plain = rc.pack_utterance_rc(ind1, ind2, idx, pcodes, sizes)
    pri = rc.collect_priors([(ind1, ind2, idx)], sizes)
    primed = rc.pack_utterance_rc(ind1, ind2, idx, pcodes, sizes,
                                  priors=pri)
    # roundtrip stays exact in both modes
    got = rc.unpack_utterance_rc(primed, sizes, priors=pri)
    np.testing.assert_array_equal(got["indices"]["vq"], idx["vq"])
    # order-0 baseline: unconditioned adaptive tables over the same
    # vq streams (the round-2 design)
    enc = rc.RangeEncoder()
    t0 = rc.AdaptiveFreqTable(64)
    t1 = rc.AdaptiveFreqTable(64)
    for t in range(length):
        rc._code_adaptive(enc, t0, int(i0[t]), False)
        rc._code_adaptive(enc, t1, int(i1[t]), False)
    order0_vq_bits = len(enc.finish()) * 8
    # conditioned-without-priors must already beat order-0 on the vq
    # payload share; priors must beat conditioned-alone
    assert len(primed) < len(plain), (len(primed), len(plain))
    # total conditioned stream (incl. pitch/ind/scl overhead) stays
    # below order-0 vq bits alone + that overhead approximated by the
    # plain/primed delta -- simplest robust check: primed total less
    # than order-0 vq payload + 4 bits/frame overhead
    assert len(primed) * 8 < order0_vq_bits + 4 * length


def test_entropy_pack_roundtrip_and_rate(setup):
    params, cbs, feat = setup
    feat_long = (RNG.randn(1, 60, 20) * 0.3).astype(np.float32)
    enc = encode(params, cbs, jnp.asarray(feat_long))
    counts = fp.usage_counts(cbs, enc["indices"])
    ind1 = np.asarray(enc["ind1"])[0]
    ind2 = np.asarray(enc["ind2"])[0]
    models = {
        "ind1": rc.FreqTable([np.sum(~ind1), np.sum(ind1)]),
        "ind2": rc.FreqTable([np.sum(~ind2), np.sum(ind2)]),
        "scl": rc.FreqTable(np.asarray(counts[0])),
        "scl_bl": rc.FreqTable(np.asarray(counts[1])),
        "vq_0": rc.FreqTable(np.asarray(counts[2])),
        "vq_bl_0": rc.FreqTable(np.asarray(counts[3])),
    }
    indices = {k: np.asarray(v)[0] for k, v in enc["indices"].items()}
    data = rc.entropy_pack(ind1, ind2, indices, models)
    got = rc.entropy_unpack(data, len(ind1), models, n_vq=1, n_vq_bl=1)
    np.testing.assert_array_equal(got["ind1"], ind1)
    np.testing.assert_array_equal(got["ind2"], ind2)
    for k in ("scl", "vq", "scl_bl", "vq_bl"):
        want = indices[k]
        mask = want >= 0
        np.testing.assert_array_equal(
            np.asarray(got["indices"][k])[mask], want[mask])
    # entropy coding beats fixed-width packing of the same streams
    # (indicators + codebook indices; pitch excluded on both sides)
    from fpsc_tpu.codec.bitstream import _nbits
    fixed_bits = len(ind1) * 2 + int(ind1.sum()) * _nbits(8) + \
        int((~ind1).sum()) * _nbits(4) + int(ind2.sum()) * _nbits(16) + \
        int((~ind2).sum()) * _nbits(8)
    assert len(data) * 8 <= fixed_bits


def test_fused_streaming_codec_matches_chain(setup):
    """StreamingCodec (one compiled tick) must reproduce the
    three-class chain symbol-for-symbol and sample-for-sample."""
    from fpsc_tpu.codec.streaming import (StreamingCodec,
                                          StreamingDecoder,
                                          StreamingEncoder,
                                          StreamingVocoder)
    from fpsc_tpu.models import lpcnet
    params, cbs, feat = setup
    lcfg = lpcnet.LPCNetConfig(gru_a_units=16, gru_b_units=8,
                               embed_dim=8, cond_units=8)
    vparams = lpcnet.init_lpcnet(jax.random.PRNGKey(1), lcfg)

    fused = StreamingCodec(params, cbs, vparams, seed=7)
    enc = StreamingEncoder(params, cbs)
    dec = StreamingDecoder(params, cbs)
    voc = StreamingVocoder(vparams, seed=7)
    got_audio, chain_audio = [], []
    for t in range(feat.shape[1]):
        got = fused.process_frame(feat[0, t])
        out = enc.encode_frame(feat[0, t])
        coded = dec.decode_frame(out["ind1"], out["ind2"],
                                 out["indices"], feat[0, t, 18:])
        assert bool(got["ind1"]) == bool(out["ind1"])
        np.testing.assert_array_equal(got["indices"]["vq"],
                                      out["indices"]["vq"])
        # decoded features: jit-boundary rounding only (~1 ulp)
        np.testing.assert_allclose(got["coded"], coded,
                                   rtol=1e-5, atol=1e-6)
        # drive the standalone vocoder with the FUSED run's coded
        # features so its inputs are bit-identical - the comparison
        # then isolates the vocoder-program equivalence
        audio = voc.synthesize_frame(got["coded"])
        got_audio.append(got["audio"])
        chain_audio.append(audio)
    assert got["audio"].shape == (160,)
    # audio: the fused program and the separately-jitted program can
    # still round differently inside XLA, which can flip a knife-edge
    # sampling decision that then cascades through the AR state - same
    # statistical contract as the pallas sampler tests: exact tracking
    # up to the first flip, and the flip must not be at t=0
    ga = np.concatenate(got_audio)
    ca = np.concatenate(chain_audio)
    diverged = np.argwhere(np.abs(ga - ca) > 1e-3).ravel()
    t0 = int(diverged[0]) if len(diverged) else len(ga)
    assert t0 > 160, f"fused audio diverges from the chain at t={t0}"
    np.testing.assert_allclose(ga[:t0], ca[:t0], rtol=1e-4, atol=1e-5)


def test_fused_streaming_codec_batched(setup):
    from fpsc_tpu.codec.streaming import StreamingCodec
    from fpsc_tpu.models import lpcnet
    params, cbs, _ = setup
    lcfg = lpcnet.LPCNetConfig(gru_a_units=16, gru_b_units=8,
                               embed_dim=8, cond_units=8)
    vparams = lpcnet.init_lpcnet(jax.random.PRNGKey(1), lcfg)
    fused = StreamingCodec(params, cbs, vparams, batch=3)
    rows = (np.random.RandomState(4).randn(3, 20) * 0.3
            ).astype(np.float32)
    out = fused.process_frame(rows)
    assert out["audio"].shape == (3, 160)
    assert np.isfinite(out["audio"]).all()
    assert not np.array_equal(out["audio"][0], out["audio"][1])


def test_streaming_range_coder_lockstep_matches_offline():
    """StreamingRangeEncoder/Decoder in lockstep over randomized
    symbol streams: the decoder reconstructs every frame exactly, the
    concatenated streaming bytes EQUAL the offline pack_utterance_rc
    body (no per-frame flush overhead), and the decoder's lag behind
    the encoder stays within the coder's 4-byte pipeline."""
    from fpsc_tpu.codec import bitstream as bs

    rng = np.random.RandomState(7)
    for trial in range(4):
        sizes = {"scl": 256, "scl_bl": 16,
                 "vq": [64, 64], "vq_bl": [64]}
        length = rng.randint(20, 60)
        ind1 = rng.rand(length) < 0.3
        ind2 = rng.rand(length) < 0.4
        idx = {
            "scl": np.where(ind1, rng.randint(256, size=length), -1),
            "scl_bl": np.where(~ind1, rng.randint(16, size=length), -1),
            "vq": np.stack([np.where(ind2, rng.randint(64, size=length),
                                     -1) for _ in range(2)], 1),
            "vq_bl": np.where(~ind2, rng.randint(64, size=length),
                              -1)[:, None],
        }
        pitch = np.stack([
            (rng.randint(32, 288, length) - 100.0) / 50.0,
            rng.uniform(-0.5, 0.4, length)], 1)
        pcodes = bs.quantize_pitch(pitch)
        orders = {"scl": rng.permutation(256),
                  "scl_bl": rng.permutation(16)}
        pri = rc.collect_priors([(ind1, ind2, idx, pcodes)], sizes,
                                orders=orders)

        enc = rc.StreamingRangeEncoder(sizes, priors=pri, orders=orders)
        dec = rc.StreamingRangeDecoder(sizes, priors=pri, orders=orders)
        got, stream, max_lag = [], b"", 0
        for t in range(length):
            row = {k: (idx[k][t] if idx[k].ndim == 1 else idx[k][t])
                   for k in idx}
            chunk = enc.push_frame(ind1[t], ind2[t], row, pcodes[t])
            stream += chunk
            dec.push_bytes(chunk)
            while True:
                f = dec.pull_frame()
                if f is None:
                    break
                got.append(f)
            max_lag = max(max_lag, (t + 1) - len(got))
        tail = enc.finish()
        stream += tail
        dec.push_bytes(tail, final=True)
        while len(got) < length:
            f = dec.pull_frame()
            assert f is not None
            got.append(f)

        # bit-exactness vs the offline packer (header + same body)
        offline = rc.pack_utterance_rc(ind1, ind2, idx, pcodes, sizes,
                                       priors=pri, orders=orders)
        assert offline[2:] == stream, trial
        # the decoder never falls more than a few frames behind
        assert max_lag <= 4, max_lag

        for t in range(length):
            f = got[t]
            assert f["ind1"] == ind1[t] and f["ind2"] == ind2[t]
            if ind1[t]:
                assert f["indices"]["scl"] == idx["scl"][t]
            else:
                assert f["indices"]["scl_bl"] == idx["scl_bl"][t]
            if ind2[t]:
                np.testing.assert_array_equal(f["indices"]["vq"],
                                              idx["vq"][t])
            else:
                np.testing.assert_array_equal(f["indices"]["vq_bl"],
                                              idx["vq_bl"][t])
            np.testing.assert_array_equal(f["pcodes"], pcodes[t])


def test_streaming_frontend_matches_batch_extractor():
    """StreamingFrontend must reproduce the batch extractor
    frame-for-frame: tick k emits frame k-1 (one block lookahead,
    tick-0 warmup discarded).  Same-op parity: cepstra to f32
    rounding, pitch features exactly (the ring at tick k IS frame
    k-1's pitch context)."""
    from fpsc_tpu.codec.streaming import StreamingFrontend
    from fpsc_tpu.data.synthetic import speech_like_waveform
    from fpsc_tpu.dsp import constants as C
    from fpsc_tpu.dsp.frontend import extract_features

    x = np.asarray(speech_like_waveform(
        np.random.RandomState(11), 16000))[:8000].astype(np.float32)
    n_frames = len(x) // C.FRAME_SIZE - 1
    ref = np.asarray(extract_features(jnp.asarray(x)))  # (T, 36)
    ref_feat = ref[:, :20] / C.MAXI

    sf = StreamingFrontend()
    got = []
    for k in range(len(x) // C.FRAME_SIZE):
        block = x[k * C.FRAME_SIZE:(k + 1) * C.FRAME_SIZE]
        out = sf.process_block(block)
        if k >= 1:                      # tick 0 is warmup
            got.append(out)
    got = np.asarray(got)[:n_frames]
    assert got.shape == (n_frames, 20)
    # cepstra: identical math, jit-boundary rounding only
    np.testing.assert_allclose(got[:, :18], ref_feat[:n_frames, :18],
                               rtol=1e-4, atol=2e-5)
    # pitch features: periods must agree lag-for-lag except f32
    # knife-edge argmax flips (same contract as the jnp-vs-np
    # frontend tests); correlations to small tolerance
    lag_got = got[:, 18] * C.MAXI * 50.0 + 100.0
    lag_ref = ref_feat[:n_frames, 18] * C.MAXI * 50.0 + 100.0
    mismatch = np.abs(lag_got - lag_ref) > 0.5
    assert mismatch.mean() <= 0.04, (
        f"{mismatch.sum()}/{n_frames} lag mismatches")
    np.testing.assert_allclose(
        got[~mismatch, 19], ref_feat[:n_frames][~mismatch, 19],
        rtol=1e-3, atol=1e-4)


def test_streaming_codec_pcm_matches_frontend_plus_chain(setup):
    """StreamingCodec(from_pcm=True) — the mic-to-speech single
    dispatch — must equal StreamingFrontend + feature-mode
    StreamingCodec tick-for-tick on symbols and coded features."""
    from fpsc_tpu.codec.streaming import StreamingCodec, StreamingFrontend
    from fpsc_tpu.data.synthetic import speech_like_waveform
    from fpsc_tpu.dsp import constants as C
    from fpsc_tpu.models import lpcnet
    params, cbs, _ = setup
    lcfg = lpcnet.LPCNetConfig(gru_a_units=16, gru_b_units=8,
                               embed_dim=8, cond_units=8)
    vparams = lpcnet.init_lpcnet(jax.random.PRNGKey(1), lcfg)

    x = np.asarray(speech_like_waveform(
        np.random.RandomState(3), 16000))[:2400].astype(np.float32)

    pcm_codec = StreamingCodec(params, cbs, vparams, seed=7,
                               from_pcm=True)
    feat_codec = StreamingCodec(params, cbs, vparams, seed=7)
    sf = StreamingFrontend()
    for k in range(len(x) // C.FRAME_SIZE):
        block = x[k * C.FRAME_SIZE:(k + 1) * C.FRAME_SIZE]
        got = pcm_codec.process_pcm(block)
        feat = sf.process_block(block)
        ref = feat_codec.process_frame(feat)
        assert got["audio"].shape == (160,)
        assert bool(got["ind1"]) == bool(ref["ind1"])
        assert bool(got["ind2"]) == bool(ref["ind2"])
        np.testing.assert_array_equal(got["indices"]["vq"],
                                      ref["indices"]["vq"])
        np.testing.assert_allclose(got["coded"], ref["coded"],
                                   rtol=1e-4, atol=1e-5)


def test_streaming_transmitter_matches_frontend_plus_encoder(setup):
    """StreamingTransmitter — the encoder-only single dispatch (mic
    PCM -> symbols, ROADMAP r4 #5) — must equal the per-stage
    StreamingFrontend + StreamingEncoder chain tick-for-tick."""
    from fpsc_tpu.codec.streaming import (StreamingEncoder,
                                          StreamingFrontend,
                                          StreamingTransmitter)
    from fpsc_tpu.data.synthetic import speech_like_waveform
    from fpsc_tpu.dsp import constants as C
    params, cbs, _ = setup

    x = np.asarray(speech_like_waveform(
        np.random.RandomState(9), 16000))[:2400].astype(np.float32)

    tx = StreamingTransmitter(params, cbs)
    sf = StreamingFrontend()
    enc = StreamingEncoder(params, cbs)
    for k in range(len(x) // C.FRAME_SIZE):
        block = x[k * C.FRAME_SIZE:(k + 1) * C.FRAME_SIZE]
        got = tx.process_pcm(block)
        ref = enc.encode_frame(sf.process_block(block))
        assert bool(got["ind1"]) == bool(ref["ind1"])
        assert bool(got["ind2"]) == bool(ref["ind2"])
        for key in ("scl", "scl_bl", "vq", "vq_bl"):
            np.testing.assert_array_equal(got["indices"][key],
                                          ref["indices"][key])
        np.testing.assert_allclose(got["coded"], ref["coded"],
                                   rtol=1e-4, atol=1e-5)


def test_streaming_transmitter_batched(setup):
    """Batched transmitter streams are independent: stream i of a
    batch-3 transmitter equals a batch-1 transmitter fed stream i."""
    from fpsc_tpu.codec.streaming import StreamingTransmitter
    from fpsc_tpu.data.synthetic import speech_like_waveform
    from fpsc_tpu.dsp import constants as C
    params, cbs, _ = setup

    b, frames = 3, 8
    x = np.stack([np.asarray(speech_like_waveform(
        np.random.RandomState(20 + i), frames * C.FRAME_SIZE))
        for i in range(b)]).astype(np.float32)

    txb = StreamingTransmitter(params, cbs, batch=b)
    singles = [StreamingTransmitter(params, cbs) for _ in range(b)]
    for k in range(frames):
        blocks = x[:, k * C.FRAME_SIZE:(k + 1) * C.FRAME_SIZE]
        got = txb.process_pcm(blocks)
        for i in range(b):
            ref = singles[i].process_pcm(blocks[i])
            np.testing.assert_allclose(got["coded"][i], ref["coded"],
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_array_equal(got["indices"]["vq"][i],
                                          ref["indices"]["vq"])
