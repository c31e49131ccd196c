"""Packet-loss concealment + packetized bitstream tests.

Contracts:
  * conceal_decode with no loss is arithmetically identical to
    codec.decode (same scan, keep=1 / fade=0 are exact no-ops);
  * with everything lost it free-runs the predictor (slow-oracle
    per-frame Python loop, house convention);
  * after a burst the closed loop CONTRACTS the error (the property
    residual coding rests on);
  * pack_packets packets decode independently: any subset lost leaves
    every other frame bit-exact, and no loss reproduces the plain
    pack_utterance_rc symbol streams.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpsc_tpu.codec import bitstream as bs
from fpsc_tpu.codec import plc
from fpsc_tpu.codec import range_coder as rc
from fpsc_tpu.codec.codec import decode, encode
from fpsc_tpu.models import frame_predictor as fp

RNG = np.random.RandomState(11)


@pytest.fixture(scope="module")
def setup():
    cfg = fp.FramePredictorConfig(gru_units1=32, gru_units2=16)
    params = fp.init_frame_predictor(jax.random.PRNGKey(3), cfg)
    r = np.random.RandomState(5)
    cbs = fp.Codebooks(
        scl=jnp.asarray(np.sort(r.randn(16)).astype(np.float32) * 0.1),
        vq=(jnp.asarray(r.randn(32, 17).astype(np.float32) * 0.1),
            jnp.asarray(r.randn(16, 17).astype(np.float32) * 0.03)),
        scl_bl=jnp.asarray(np.sort(r.randn(4)).astype(np.float32) * 0.02),
        vq_bl=(jnp.asarray(r.randn(8, 17).astype(np.float32) * 0.02),),
    )
    feat = (RNG.randn(2, 24, 20) * 0.3).astype(np.float32)
    enc = encode(params, cbs, jnp.asarray(feat))
    return params, cbs, feat, enc


def test_conceal_no_loss_matches_decode(setup):
    params, cbs, feat, enc = setup
    pitch = jnp.asarray(feat[..., 18:])
    dec = decode(params, cbs, enc["ind1"], enc["ind2"], enc["indices"],
                 pitch)
    lost = jnp.zeros(feat.shape[:2], bool)
    con = plc.conceal_decode(params, cbs, enc["ind1"], enc["ind2"],
                             enc["indices"], pitch, lost)
    np.testing.assert_array_equal(np.asarray(con), np.asarray(dec))


def test_conceal_all_lost_free_runs_predictor(setup):
    """Everything lost -> pure prediction from zero state with held
    (zero) pitch; slow oracle is a per-frame Python loop.  damp=1 /
    energy_cap=False is the documented legacy free-run mode."""
    params, cbs, feat, enc = setup
    b, length = feat.shape[:2]
    pitch = jnp.asarray(feat[..., 18:])
    lost = jnp.ones((b, length), bool)
    con = np.asarray(plc.conceal_decode(
        params, cbs, enc["ind1"], enc["ind2"], enc["indices"], pitch,
        lost, fade_step=0.0, damp=1.0, energy_cap=False))

    h1 = jnp.zeros((b, params.rnn1.units), jnp.float32)
    h2 = jnp.zeros((b, params.rnn2.units), jnp.float32)
    prev = jnp.zeros((b, 18), jnp.float32)
    zero_pitch = jnp.zeros((b, 2), jnp.float32)
    for t in range(length):
        inp = jnp.concatenate([prev, zero_pitch], axis=-1)
        f_out, h1, h2 = fp.step(params, h1, h2, inp)
        prev = f_out
        np.testing.assert_allclose(con[:, t, :18], np.asarray(prev),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(con[:, t, 18:], 0.0)


def test_conceal_recovery_contracts_error(setup):
    """Frames before a burst are exact; after it, the received
    residuals pull the decoder back toward the encoder's track."""
    params, cbs, feat, enc = setup
    pitch = jnp.asarray(feat[..., 18:])
    lost = np.zeros(feat.shape[:2], bool)
    lost[:, 5:9] = True
    con = np.asarray(plc.conceal_decode(
        params, cbs, enc["ind1"], enc["ind2"], enc["indices"], pitch,
        jnp.asarray(lost)))
    coded = np.asarray(enc["coded"])
    err = np.abs(con[..., :18] - coded[..., :18]).mean(axis=(0, 2))
    np.testing.assert_allclose(err[:5], 0.0, atol=1e-6)
    assert err[9] > 0  # state drifted through the burst
    # closed-loop contraction: the tail error is well below the error
    # at the first received frame after the burst
    assert err[-4:].mean() < 0.5 * err[9], err


def test_damped_conceal_matches_slow_oracle(setup):
    """Round-4 damped policy vs a per-frame Python loop (house
    convention): blend alpha = damp^(run-1) toward the previous
    output, c0 capped at prev's c0, fade past fade_after."""
    params, cbs, feat, enc = setup
    b, length = feat.shape[:2]
    pitch = jnp.asarray(feat[..., 18:])
    lost = np.zeros((b, length), bool)
    lost[:, 4:12] = True         # 8-frame outage exercises the blend
    lost[0, 16] = True           # isolated loss: pure free-run frame
    damp, fade_after, fade_step = 0.8, 3, 0.02
    con = np.asarray(plc.conceal_decode(
        params, cbs, enc["ind1"], enc["ind2"], enc["indices"], pitch,
        jnp.asarray(lost), fade_after=fade_after, fade_step=fade_step,
        damp=damp))

    from fpsc_tpu.codec.codec import dequantize_residual
    r = np.asarray(dequantize_residual(cbs, enc["ind1"], enc["ind2"],
                                       enc["indices"]))
    h1 = jnp.zeros((b, params.rnn1.units), jnp.float32)
    h2 = jnp.zeros((b, params.rnn2.units), jnp.float32)
    prev = np.zeros((b, 18), np.float32)
    prev_pitch = np.zeros((b, 2), np.float32)
    run = np.zeros((b,), np.float32)
    for t in range(length):
        lt = lost[:, t]
        pit = np.where(lt[:, None], prev_pitch,
                       feat[:, t, 18:]).astype(np.float32)
        inp = jnp.asarray(np.concatenate([prev, pit], axis=-1))
        f_out, h1, h2 = fp.step(params, h1, h2, inp)
        f_out = np.asarray(f_out)
        run = np.where(lt, run + 1.0, 0.0)
        alpha = damp ** np.maximum(run - 1.0, 0.0)
        f_con = alpha[:, None] * f_out + (1 - alpha)[:, None] * prev
        f_con[:, 0] = np.minimum(f_con[:, 0], prev[:, 0])
        frame = np.where(lt[:, None], f_con, f_out + r[:, t])
        frame[:, 0] -= np.maximum(run - fade_after, 0.0) * fade_step
        np.testing.assert_allclose(con[:, t, :18], frame,
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"frame {t}")
        prev, prev_pitch = frame.astype(np.float32), pit
    # energy during the outage is monotone non-increasing
    c0 = con[:, 3:12, 0]
    assert np.all(np.diff(c0, axis=1) <= 1e-6)


def test_damped_conceal_bounded_on_long_outage(setup):
    """The round-3 failure mode: undamped free-run can drift
    arbitrarily; the damped output must stay within the envelope of
    the last received frame (plus fade) for every concealed frame."""
    params, cbs, feat, enc = setup
    b, length = feat.shape[:2]
    pitch = jnp.asarray(feat[..., 18:])
    lost = np.zeros((b, length), bool)
    lost[:, 6:] = True
    con = np.asarray(plc.conceal_decode(
        params, cbs, enc["ind1"], enc["ind2"], enc["indices"], pitch,
        jnp.asarray(lost)))
    # c0 never rises above the last received frame's c0
    assert np.all(con[:, 6:, 0] <= con[:, 5, 0][:, None] + 1e-6)
    # the tail converges toward a hold (c0 excluded — its diff
    # converges to the deliberate fade_step, not zero): per-frame
    # movement contracts and stays contracted (the faded c0 feeding
    # back keeps the predictor moving slightly, so the floor is ~0.4x,
    # not 0 — still an order of magnitude below undamped free-run)
    d = np.abs(np.diff(con[:, 6:, 1:18], axis=1)).mean(axis=(0, 2))
    assert d[-1] < 0.5 * d[0] + 1e-6, d
    assert d[3:].min() < 0.25 * d[0] + 1e-6, d


def test_fade_attenuates_c0_on_long_burst(setup):
    params, cbs, feat, enc = setup
    pitch = jnp.asarray(feat[..., 18:])
    lost = np.zeros(feat.shape[:2], bool)
    lost[:, 6:] = True
    kw = dict(fade_after=3, fade_step=0.02)
    con = np.asarray(plc.conceal_decode(
        params, cbs, enc["ind1"], enc["ind2"], enc["indices"], pitch,
        jnp.asarray(lost), **kw))
    ref = np.asarray(plc.conceal_decode(
        params, cbs, enc["ind1"], enc["ind2"], enc["indices"], pitch,
        jnp.asarray(lost), fade_after=3, fade_step=0.0))
    # the first faded frame is lost-frame #4 (t=9); its c0 sits one
    # fade_step below the unfaded free-run (later frames also feed the
    # faded energy back through the predictor)
    np.testing.assert_array_equal(con[:, :9], ref[:, :9])
    np.testing.assert_allclose(con[:, 9, 0], ref[:, 9, 0] - 0.02,
                               rtol=1e-5, atol=1e-6)
    assert np.all(con[:, -1, 0] < ref[:, -1, 0] - 0.05)


def _streams(enc, feat, i):
    ind1 = np.asarray(enc["ind1"])[i]
    ind2 = np.asarray(enc["ind2"])[i]
    idx = {k: np.asarray(v)[i] for k, v in enc["indices"].items()}
    pcodes = bs.quantize_pitch(feat[i, :, 18:])
    return ind1, ind2, idx, pcodes


def test_pack_packets_no_loss_matches_plain(setup):
    params, cbs, feat, enc = setup
    from fpsc_tpu.train.generate_qtz_features import codebook_sizes
    sizes = codebook_sizes(cbs)
    ind1, ind2, idx, pcodes = _streams(enc, feat, 0)
    for pf in (1, 5, 7, 24, 30):
        pkts = rc.pack_packets(ind1, ind2, idx, pcodes,
                               sizes, packet_frames=pf)
        got = rc.unpack_packets(pkts, sizes, packet_frames=pf)
        assert not got["lost"].any()
        np.testing.assert_array_equal(got["ind1"], ind1)
        np.testing.assert_array_equal(got["ind2"], ind2)
        for k in idx:
            want = np.atleast_2d(np.asarray(idx[k])) \
                if got["indices"][k].ndim == 2 else idx[k]
            live = np.asarray(want) >= 0
            np.testing.assert_array_equal(
                np.asarray(got["indices"][k])[live],
                np.asarray(want)[live], err_msg=f"{k} pf={pf}")
        np.testing.assert_allclose(got["pitch"],
                                   bs.dequantize_pitch(pcodes),
                                   rtol=1e-6)


def test_pack_packets_lost_packets_leave_rest_exact(setup):
    params, cbs, feat, enc = setup
    from fpsc_tpu.train.generate_qtz_features import codebook_sizes
    sizes = codebook_sizes(cbs)
    ind1, ind2, idx, pcodes = _streams(enc, feat, 1)
    pf = 5
    pkts = rc.pack_packets(ind1, ind2, idx, pcodes, sizes,
                           packet_frames=pf)
    lossy = list(pkts)
    lossy[1] = None
    lossy[3] = None
    got = rc.unpack_packets(lossy, sizes, packet_frames=pf)
    want_lost = np.zeros(len(ind1), bool)
    want_lost[5:10] = True
    want_lost[15:20] = True
    np.testing.assert_array_equal(got["lost"], want_lost)
    keep = ~want_lost
    np.testing.assert_array_equal(got["ind1"][keep], ind1[keep])
    np.testing.assert_array_equal(got["ind2"][keep], ind2[keep])
    for k in ("scl", "vq"):
        want = np.asarray(idx[k])
        live = (want >= 0) & (keep[:, None] if want.ndim == 2
                              else keep)
        np.testing.assert_array_equal(
            np.asarray(got["indices"][k])[live], want[live])

    # losing the LAST (short) packet needs total_frames for alignment
    lossy = list(pkts)
    lossy[-1] = None
    got = rc.unpack_packets(lossy, sizes, packet_frames=pf,
                            total_frames=len(ind1))
    assert len(got["lost"]) == len(ind1)
    assert got["lost"][-(len(ind1) - (len(pkts) - 1) * pf):].all()


def test_packetized_conceal_end_to_end(setup):
    """Transport chain: packets -> drop one -> unpack -> conceal ->
    frames before the loss match the lossless decode exactly."""
    params, cbs, feat, enc = setup
    from fpsc_tpu.train.generate_qtz_features import codebook_sizes
    sizes = codebook_sizes(cbs)
    ind1, ind2, idx, pcodes = _streams(enc, feat, 0)
    pf = 6
    pkts = rc.pack_packets(ind1, ind2, idx, pcodes, sizes,
                           packet_frames=pf)
    lossy = list(pkts)
    lossy[2] = None
    got = rc.unpack_packets(lossy, sizes, packet_frames=pf)
    # quantize_pitch above was fed the feature-domain pitch columns,
    # so the dequantised track feeds decode/conceal directly
    pitch = jnp.asarray(got["pitch"][None].astype(np.float32))
    con = np.asarray(plc.conceal_decode(
        params, cbs, jnp.asarray(got["ind1"][None]),
        jnp.asarray(got["ind2"][None]),
        {k: jnp.asarray(v[None]) for k, v in got["indices"].items()},
        pitch, jnp.asarray(got["lost"][None])))
    full = rc.unpack_packets(pkts, sizes, packet_frames=pf)
    dec = np.asarray(decode(
        params, cbs, jnp.asarray(full["ind1"][None]),
        jnp.asarray(full["ind2"][None]),
        {k: jnp.asarray(v[None]) for k, v in full["indices"].items()},
        jnp.asarray(full["pitch"][None].astype(np.float32))))
    np.testing.assert_array_equal(con[:, :12], dec[:, :12])
    assert np.isfinite(con).all()


def _lean(cbs):
    from fpsc_tpu.codec.rate_control import PRESETS, preset_codebooks
    return preset_codebooks(cbs, **PRESETS["lean"])


def test_fec_requantize_is_leaner_but_close(setup):
    params, cbs, feat, enc = setup
    lean = _lean(cbs)
    from fpsc_tpu.codec.codec import dequantize_residual
    fec_idx = plc.fec_requantize(lean, enc["r"], enc["ind1"],
                                 enc["ind2"])
    assert np.asarray(fec_idx["vq"]).shape[-1] == 1   # 1 lean stage
    r_fec = np.asarray(dequantize_residual(
        lean, enc["ind1"], enc["ind2"],
        {k: jnp.asarray(v) for k, v in fec_idx.items()}))
    r_full = np.asarray(enc["r_qtz"])
    r = np.asarray(enc["r"])
    e_fec = np.abs(r_fec - r).mean()
    e_full = np.abs(r_full - r).mean()
    assert e_full <= e_fec < 4.0 * e_full + 1e-3, (e_full, e_fec)


def test_fec_pack_roundtrip_and_recovery(setup):
    params, cbs, feat, enc = setup
    from fpsc_tpu.train.generate_qtz_features import codebook_sizes
    sizes = codebook_sizes(cbs)
    lean = _lean(cbs)
    fec_sizes = codebook_sizes(lean)
    fec_all = plc.fec_requantize(lean, enc["r"], enc["ind1"],
                                 enc["ind2"])
    i = 0
    ind1, ind2, idx, pcodes = _streams(enc, feat, i)
    fidx = {k: np.asarray(v)[i] for k, v in fec_all.items()}
    pf = 6
    pkts = rc.pack_packets_fec(ind1, ind2, idx, pcodes, sizes,
                               fidx, fec_sizes, packet_frames=pf)
    plain = rc.pack_packets(ind1, ind2, idx, pcodes, sizes,
                            packet_frames=pf)
    assert sum(map(len, pkts)) > sum(map(len, plain))  # redundancy costs

    # no loss: primary streams reproduced, nothing from FEC
    got = rc.unpack_packets_fec(pkts, sizes, fec_sizes,
                                packet_frames=pf)
    assert not got["lost"].any() and not got["from_fec"].any()
    np.testing.assert_array_equal(got["ind1"], ind1)
    for k in ("scl", "vq"):
        live = idx[k] >= 0
        np.testing.assert_array_equal(
            np.asarray(got["indices"][k])[live], idx[k][live])

    # isolated loss: the span is recovered from the NEXT packet's
    # redundancy, index-for-index
    lossy = list(pkts)
    lossy[1] = None
    got = rc.unpack_packets_fec(lossy, sizes, fec_sizes,
                                packet_frames=pf)
    span = slice(pf, 2 * pf)
    assert not got["lost"].any()
    assert got["from_fec"][span].all() and got["from_fec"].sum() == pf
    np.testing.assert_array_equal(got["ind1"][span], ind1[span])
    np.testing.assert_array_equal(got["ind2"][span], ind2[span])
    for k in ("scl", "vq"):
        want = fidx[k][span]
        live = want >= 0
        np.testing.assert_array_equal(
            np.asarray(got["fec_indices"][k])[span][live], want[live],
            err_msg=k)

    # back-to-back losses: the first span has no surviving redundancy
    # (it rode in the second lost packet); the second recovers
    lossy = list(pkts)
    lossy[1] = None
    lossy[2] = None
    got = rc.unpack_packets_fec(lossy, sizes, fec_sizes,
                                packet_frames=pf)
    assert got["lost"][pf:2 * pf].all()
    assert got["from_fec"][2 * pf:3 * pf].all()


def test_fec_decode_beats_concealment(setup):
    """Recovered spans decode with near-primary fidelity: the FEC
    chain's error on an isolated loss is far below free-run
    concealment's."""
    params, cbs, feat, enc = setup
    from fpsc_tpu.train.generate_qtz_features import codebook_sizes
    sizes = codebook_sizes(cbs)
    lean = _lean(cbs)
    fec_sizes = codebook_sizes(lean)
    fec_all = plc.fec_requantize(lean, enc["r"], enc["ind1"],
                                 enc["ind2"])
    i = 0
    ind1, ind2, idx, pcodes = _streams(enc, feat, i)
    fidx = {k: np.asarray(v)[i] for k, v in fec_all.items()}
    pf = 6
    pkts = rc.pack_packets_fec(ind1, ind2, idx, pcodes, sizes,
                               fidx, fec_sizes, packet_frames=pf)
    lossy = list(pkts)
    lossy[1] = None
    got = rc.unpack_packets_fec(lossy, sizes, fec_sizes,
                                packet_frames=pf)
    r, pitch, lost = plc.fec_merge_residual(cbs, lean, got)
    dec_fec = np.asarray(plc.conceal_decode_residual(
        params, r, pitch.astype(jnp.float32), lost))
    dec_full = np.asarray(decode(
        params, cbs, enc["ind1"][:1], enc["ind2"][:1],
        {k: v[:1] for k, v in enc["indices"].items()},
        jnp.asarray(np.asarray(got["pitch"])[None],
                    jnp.float32)))
    # concealment-only arm on the same loss pattern
    plain = rc.unpack_packets(
        [p if j != 1 else None for j, p in enumerate(
            rc.pack_packets(ind1, ind2, idx, pcodes, sizes,
                            packet_frames=pf))],
        sizes, packet_frames=pf)
    dec_con = np.asarray(plc.conceal_decode(
        params, cbs, jnp.asarray(plain["ind1"][None]),
        jnp.asarray(plain["ind2"][None]),
        {k: jnp.asarray(v[None]) for k, v in plain["indices"].items()},
        jnp.asarray(plain["pitch"][None], jnp.float32),
        jnp.asarray(plain["lost"][None])))
    span = slice(pf, 2 * pf)
    e_fec = np.abs(dec_fec[0, span, :18] - dec_full[0, span, :18]).mean()
    e_con = np.abs(dec_con[0, span, :18] - dec_full[0, span, :18]).mean()
    assert e_fec < 0.5 * e_con, (e_fec, e_con)
    # outside the loss both tracks are exact
    np.testing.assert_allclose(dec_fec[0, :pf], dec_full[0, :pf],
                               atol=1e-6)


def test_streaming_receiver_matches_batch_conceal(setup):
    """The fused receiver tick (concealing decode + vocoder, one
    program) tracks codec/plc.conceal_decode frame-for-frame on the
    coded features, loss or no loss, and emits audio per tick."""
    from fpsc_tpu.codec.streaming import StreamingReceiver
    from fpsc_tpu.models import lpcnet
    params, cbs, feat, enc = setup
    lcfg = lpcnet.LPCNetConfig(gru_a_units=16, gru_b_units=8,
                               embed_dim=8, cond_units=8)
    voc = lpcnet.init_lpcnet(jax.random.PRNGKey(1), lcfg)
    pitch = jnp.asarray(feat[..., 18:])
    lost = np.zeros(feat.shape[:2], bool)
    lost[:, 4:7] = True
    lost[:, 15] = True
    want = np.asarray(plc.conceal_decode(
        params, cbs, enc["ind1"], enc["ind2"], enc["indices"], pitch,
        jnp.asarray(lost)))

    recv = StreamingReceiver(params, cbs, voc, batch=feat.shape[0])
    idx = {k: np.asarray(v) for k, v in enc["indices"].items()}
    for t in range(feat.shape[1]):
        out = recv.process_symbols(
            np.asarray(enc["ind1"])[:, t], np.asarray(enc["ind2"])[:, t],
            {k: v[:, t] for k, v in idx.items()},
            feat[:, t, 18:], lost=lost[:, t])
        np.testing.assert_allclose(out["coded"], want[:, t],
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"frame {t}")
        assert out["audio"].shape == (feat.shape[0], 160)
        assert np.isfinite(out["audio"]).all()


def test_fec_packet_receiver_streams_match_offline(setup):
    """Transport glue: FecPacketReceiver's one-packet-delayed frame
    emission + the StreamingReceiver FEC tick reproduce the OFFLINE
    chain (unpack_packets_fec -> fec_merge_residual ->
    conceal_decode_residual) frame-for-frame."""
    from fpsc_tpu.codec.streaming import StreamingReceiver
    from fpsc_tpu.models import lpcnet
    params, cbs, feat, enc = setup
    from fpsc_tpu.train.generate_qtz_features import codebook_sizes
    sizes = codebook_sizes(cbs)
    lean = _lean(cbs)
    fec_sizes = codebook_sizes(lean)
    fec_all = plc.fec_requantize(lean, enc["r"], enc["ind1"],
                                 enc["ind2"])
    i = 0
    ind1, ind2, idx, pcodes = _streams(enc, feat, i)
    fidx = {k: np.asarray(v)[i] for k, v in fec_all.items()}
    pf = 4
    pkts = rc.pack_packets_fec(ind1, ind2, idx, pcodes, sizes,
                               fidx, fec_sizes, packet_frames=pf)
    lossy = list(pkts)
    lossy[2] = None          # isolated -> FEC
    lossy[4] = None          # back-to-back pair -> conceal + FEC
    lossy[5] = None

    # offline reference
    got = rc.unpack_packets_fec(lossy, sizes, fec_sizes,
                                packet_frames=pf,
                                total_frames=len(ind1))
    r, ptch, lst = plc.fec_merge_residual(cbs, lean, got)
    want = np.asarray(plc.conceal_decode_residual(
        params, r, ptch.astype(jnp.float32), lst))

    # streaming: jitter-buffer glue -> fused FEC tick
    lcfg = lpcnet.LPCNetConfig(gru_a_units=16, gru_b_units=8,
                               embed_dim=8, cond_units=8)
    voc = lpcnet.init_lpcnet(jax.random.PRNGKey(1), lcfg)
    recv = StreamingReceiver(params, cbs, voc, fec_codebooks=lean)
    jbuf = rc.FecPacketReceiver(sizes, fec_sizes, packet_frames=pf)
    frames = []
    for p in lossy:
        frames += jbuf.push_packet(p)
    frames += jbuf.finish()
    assert len(frames) == len(ind1)
    for t, f in enumerate(frames):
        assert f["lost"] == bool(got["lost"][t]), t
        assert f["from_fec"] == bool(got["from_fec"][t]), t
        out = recv.process_symbols(
            f["ind1"], f["ind2"],
            f["indices"] if not f["from_fec"] else
            {"scl": -1, "scl_bl": -1, "vq": [-1, -1], "vq_bl": [-1]},
            np.asarray(got["pitch"])[t].astype(np.float32),
            lost=f["lost"],
            fec_indices=f["indices"] if f["from_fec"] else None,
            from_fec=f["from_fec"])
        np.testing.assert_allclose(out["coded"], want[0, t],
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"frame {t}")


def test_fec_mask_gates_redundancy(setup):
    """pack_packets_fec(fec_mask=...) writes fn=0 on gated packets —
    same bytes as plain packets plus the 2-byte header — and the
    unpacker degrades to concealment exactly where redundancy was
    off, with no signalling."""
    params, cbs, feat, enc = setup
    from fpsc_tpu.train.generate_qtz_features import codebook_sizes
    sizes = codebook_sizes(cbs)
    lean = _lean(cbs)
    fec_sizes = codebook_sizes(lean)
    fec_all = plc.fec_requantize(lean, enc["r"], enc["ind1"],
                                 enc["ind2"])
    ind1, ind2, idx, pcodes = _streams(enc, feat, 0)
    fidx = {k: np.asarray(v)[0] for k, v in fec_all.items()}
    pf = 6
    n_pkts = (len(ind1) + pf - 1) // pf
    # mask off everything: byte-identical to plain packets (module the
    # identical header layout both packers share)
    off = rc.pack_packets_fec(ind1, ind2, idx, pcodes, sizes, fidx,
                              fec_sizes, packet_frames=pf,
                              fec_mask=np.zeros(n_pkts, bool))
    on = rc.pack_packets_fec(ind1, ind2, idx, pcodes, sizes, fidx,
                             fec_sizes, packet_frames=pf)
    assert all(p[1] == 0 for p in off)
    assert sum(map(len, off)) < sum(map(len, on))

    # partial mask: redundancy only in packet 2 -> losing packet 1
    # recovers, losing packet 2 conceals
    mask = np.zeros(n_pkts, bool)
    mask[2] = True
    pkts = rc.pack_packets_fec(ind1, ind2, idx, pcodes, sizes, fidx,
                               fec_sizes, packet_frames=pf,
                               fec_mask=mask)
    lossy = list(pkts)
    lossy[1] = None
    got = rc.unpack_packets_fec(lossy, sizes, fec_sizes,
                                packet_frames=pf)
    assert got["from_fec"][pf:2 * pf].all() and not got["lost"].any()
    lossy = list(pkts)
    lossy[2] = None
    got = rc.unpack_packets_fec(lossy, sizes, fec_sizes,
                                packet_frames=pf)
    assert got["lost"][2 * pf:3 * pf].all()
    assert not got["from_fec"].any()

    # the jitter-buffer receiver handles gated packets identically
    jbuf = rc.FecPacketReceiver(sizes, fec_sizes, packet_frames=pf)
    frames = []
    for p in [pkts[0], None, pkts[2], pkts[3]]:
        frames += jbuf.push_packet(p)
    frames += jbuf.finish(final_frames=len(ind1) - 3 * pf)
    assert [f["from_fec"] for f in frames[pf:2 * pf]] == [True] * pf
    assert not any(f["lost"] for f in frames[pf:2 * pf])


def test_adaptive_fec_policy_hysteresis():
    pol = plc.AdaptiveFecPolicy(on_threshold=0.02, off_threshold=0.005,
                                ema=0.5)
    assert not pol.enabled and not pol.mask(4).any()
    # clean channel: stays off
    for _ in range(5):
        assert not pol.report(0, 50)
    # loss appears: EMA crosses on_threshold -> enables
    states = [pol.report(5, 50) for _ in range(4)]
    assert states[-1] and pol.enabled and pol.mask(3).all()
    # loss clears: stays on until the EMA decays below off_threshold
    states = [pol.report(0, 50) for _ in range(12)]
    assert states[0]          # hysteresis: still on right after
    assert not states[-1]     # eventually off
    # report with total=0 leaves the estimate unchanged
    rate = pol.loss_rate
    pol.report(0, 0)
    assert pol.loss_rate == rate


def test_loss_mask_helpers():
    rng = np.random.RandomState(0)
    m = plc.random_loss_mask(rng, 4, 2000, 0.1)
    assert not m[:, 0].any()
    assert abs(m.mean() - 0.1) < 0.02
    mb = plc.burst_loss_mask(rng, 2, 5000, 0.2, mean_burst=4.0)
    assert abs(mb.mean() - 0.2) < 0.05
    runs = []
    for row in mb:
        n = 0
        for v in row:
            if v:
                n += 1
            elif n:
                runs.append(n)
                n = 0
    assert 2.5 < np.mean(runs) < 6.0, np.mean(runs)
    mp = plc.packet_loss_mask(rng, 500, 0.3)
    assert not mp[0] and abs(mp.mean() - 0.3) < 0.07


def test_dropped_final_short_packet_decodes_to_true_length(setup):
    """A lost FINAL packet that was SHORT (utterance not divisible by
    packet_frames) must not inflate the decode: total_frames (now
    recorded per utterance in the .fpsc container) pins the length,
    and FecPacketReceiver.finish(final_frames=...) emits exactly the
    true final span."""
    params, cbs, feat, enc = setup
    from fpsc_tpu.train.generate_qtz_features import codebook_sizes
    sizes = codebook_sizes(cbs)
    ind1, ind2, idx, pcodes = _streams(enc, feat, 0)
    n = 10                         # 4+4+2 at pf=4: short final span
    ind1, ind2 = ind1[:n], ind2[:n]
    idx = {k: v[:n] for k, v in idx.items()}
    pcodes = pcodes[:n]
    pf = 4
    pkts = rc.pack_packets(ind1, ind2, idx, pcodes, sizes,
                           packet_frames=pf)
    lossy = list(pkts)
    lossy[-1] = None
    got = rc.unpack_packets(lossy, sizes, packet_frames=pf,
                            total_frames=n)
    assert len(got["ind1"]) == n
    assert got["lost"][-2:].all() and not got["lost"][:-2].any()
    # without the frame count the decoder must assume a full span
    # (the pre-fix behavior, still the only option for v1 containers)
    legacy = rc.unpack_packets(lossy, sizes, packet_frames=pf)
    assert len(legacy["ind1"]) == 2 * pf + pf

    # FEC path: same geometry through unpack_packets_fec and the
    # streaming jitter buffer
    lean = _lean(cbs)
    fec_sizes = codebook_sizes(lean)
    fec_all = plc.fec_requantize(lean, enc["r"], enc["ind1"],
                                 enc["ind2"])
    fidx = {k: np.asarray(v)[0][:n] for k, v in fec_all.items()}
    fpkts = rc.pack_packets_fec(ind1, ind2, idx, pcodes, sizes,
                                fidx, fec_sizes, packet_frames=pf)
    flossy = list(fpkts)
    flossy[-1] = None
    fgot = rc.unpack_packets_fec(flossy, sizes, fec_sizes,
                                 packet_frames=pf, total_frames=n)
    assert len(fgot["ind1"]) == n
    assert fgot["lost"][-2:].all()

    jbuf = rc.FecPacketReceiver(sizes, fec_sizes, packet_frames=pf)
    frames = []
    for p in flossy:
        frames += jbuf.push_packet(p)
    frames += jbuf.finish(final_frames=n - 2 * pf)
    assert len(frames) == n
    assert frames[-1]["lost"] and frames[-2]["lost"]
    assert not frames[-3]["lost"]


def test_fec_roundtrip_with_coarse_redundancy_geometry(setup):
    """Round-4 fix: the redundancy stream may use ultra-preset books
    whose SCALAR geometry differs from the primary's (coarse scl /
    scl_bl).  Its value-rank orders and priors must then be derived
    from its own books and threaded via fec_orders/fec_priors —
    full-book orders applied to coarse codes used to emit
    out-of-range bucket symbols (a segfault in the C++ walker, now a
    loud ValueError in both walkers)."""
    import pytest as _pytest

    from fpsc_tpu.codec.rate_control import PRESETS, preset_codebooks
    from fpsc_tpu.train.generate_qtz_features import codebook_sizes

    params, cbs, feat, enc = setup
    sizes = codebook_sizes(cbs)
    ultra = preset_codebooks(
        cbs, vq_stages=1, vq_bl=False,
        scl_entries=max(4, len(np.asarray(cbs.scl)) // 4),
        scl_bl_entries=4)
    rsizes = codebook_sizes(ultra)
    assert rsizes["scl"] != sizes["scl"]      # geometry really differs
    fec_all = plc.fec_requantize(ultra, enc["r"], enc["ind1"],
                                 enc["ind2"])
    i = 0
    ind1, ind2, idx, pcodes = _streams(enc, feat, i)
    fidx = {k: np.asarray(v)[i] for k, v in fec_all.items()}
    porders = rc.scalar_orders(cbs)
    forders = rc.scalar_orders(ultra)
    pf = 6

    # mismatched orders now fail loud instead of corrupting/segfaulting
    with _pytest.raises(ValueError, match="ranks"):
        rc.pack_packets_fec(ind1, ind2, idx, pcodes, sizes,
                            fidx, rsizes, packet_frames=pf,
                            orders=porders)

    pkts = rc.pack_packets_fec(ind1, ind2, idx, pcodes, sizes,
                               fidx, rsizes, packet_frames=pf,
                               orders=porders, fec_orders=forders)
    # isolated loss recovers index-for-index through the coarse books
    lossy = list(pkts)
    lossy[1] = None
    got = rc.unpack_packets_fec(lossy, sizes, rsizes,
                                packet_frames=pf, orders=porders,
                                fec_orders=forders)
    span = slice(pf, 2 * pf)
    assert not got["lost"].any()
    assert got["from_fec"][span].all()
    np.testing.assert_array_equal(got["ind1"][span], ind1[span])
    for k in ("scl", "vq"):
        want = fidx[k][span]
        live = want >= 0
        np.testing.assert_array_equal(
            np.asarray(got["fec_indices"][k])[span][live], want[live],
            err_msg=k)
