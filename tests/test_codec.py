"""Codec-level tests: encode/decode inversion, bitstream round-trip,
codebook training entry, offline encode entry."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpsc_tpu.codec import bitstream as bs
from fpsc_tpu.codec.codec import coded_feature_windows, decode, encode
from fpsc_tpu.config.config import Config, apply_overrides
from fpsc_tpu.models import frame_predictor as fp

RNG = np.random.RandomState(21)


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
    feat = (RNG.randn(2, 19, 20) * 0.3).astype(np.float32)
    return params, cbs, feat


def test_encode_decode_inverts(setup):
    params, cbs, feat = setup
    enc = encode(params, cbs, jnp.asarray(feat))
    dec = decode(params, cbs, enc["ind1"], enc["ind2"], enc["indices"],
                 jnp.asarray(feat[..., 18:]))
    np.testing.assert_allclose(np.asarray(dec), np.asarray(enc["coded"]),
                               rtol=1e-5, atol=1e-6)


def test_mask_encode_jits_and_inverts(setup):
    """Regression (round-1 verdict weak #7): encode(use_mask=True) must
    compose under jit (no np.asarray host round trip mid-API) and its
    output keys match the threshold path; mask encode -> decode
    inverts."""
    import functools
    params, cbs, feat = setup
    f = jax.jit(functools.partial(encode, use_mask=True))
    enc = f(params, cbs, jnp.asarray(feat))
    assert enc["coded"].shape == feat.shape
    assert enc["r_qtz"].shape == feat[..., :18].shape
    dec = decode(params, cbs, enc["ind1"], enc["ind2"], enc["indices"],
                 jnp.asarray(feat[..., 18:]))
    np.testing.assert_allclose(np.asarray(dec), np.asarray(enc["coded"]),
                               rtol=1e-5, atol=1e-6)


def test_bitstream_roundtrip(setup):
    params, cbs, feat = setup
    from fpsc_tpu.train.generate_qtz_features import codebook_sizes
    sizes = codebook_sizes(cbs)
    enc = encode(params, cbs, jnp.asarray(feat))
    for i in range(feat.shape[0]):
        packed = bs.pack_utterance(
            np.asarray(enc["ind1"])[i], np.asarray(enc["ind2"])[i],
            {k: np.asarray(v)[i] for k, v in enc["indices"].items()},
            feat[i, :, 18:], sizes)
        got = bs.unpack_utterance(packed, sizes)
        np.testing.assert_array_equal(got["ind1"],
                                      np.asarray(enc["ind1"])[i])
        np.testing.assert_array_equal(got["ind2"],
                                      np.asarray(enc["ind2"])[i])
        # transmitted indices match wherever the stream was live
        for key in ("scl", "vq"):
            want = np.asarray(enc["indices"][key])[i]
            mask = want >= 0
            np.testing.assert_array_equal(got["indices"][key][mask],
                                          want[mask])


def test_decode_from_unpacked_bitstream_only(setup):
    """Full transmit chain: encode -> pack -> unpack -> decode must
    reproduce the encoder's coded track (pitch via its 8+3-bit codes)."""
    params, cbs, feat = setup
    from fpsc_tpu.train.generate_qtz_features import codebook_sizes
    sizes = codebook_sizes(cbs)
    enc = encode(params, cbs, jnp.asarray(feat))
    i = 0
    packed = bs.pack_utterance(
        np.asarray(enc["ind1"])[i], np.asarray(enc["ind2"])[i],
        {k: np.asarray(v)[i] for k, v in enc["indices"].items()},
        feat[i, :, 18:], sizes)
    got = bs.unpack_utterance(packed, sizes)
    dec = decode(params, cbs,
                 jnp.asarray(got["ind1"][None]),
                 jnp.asarray(got["ind2"][None]),
                 {k: jnp.asarray(v[None]) for k, v in
                  got["indices"].items()},
                 jnp.asarray(got["pitch"][None]))
    # ceps channels identical up to encoder pitch-vs-coded-pitch feedback
    # differences; with synthetic pitch features inside the quantiser
    # range the decode matches closely.
    np.testing.assert_allclose(np.asarray(dec)[0, :, :18],
                               np.asarray(enc["coded"])[i, :, :18],
                               rtol=1e-2, atol=5e-3)


def test_pitch_code_roundtrip():
    pitch = np.stack([np.linspace(-1.3, 3.7, 50),
                      np.linspace(-0.5, 0.5, 50)], 1).astype(np.float32)
    codes = bs.quantize_pitch(pitch)
    back = bs.dequantize_pitch(codes)
    periods = (0.1 + 50 * pitch[:, 0] + 100).astype(np.int32)
    periods_back = (0.1 + 50 * back[:, 0] + 100).astype(np.int32)
    np.testing.assert_array_equal(np.clip(periods, 32, 287), periods_back)


def test_coded_feature_windows(setup):
    params, cbs, feat = setup
    enc = encode(params, cbs, jnp.asarray(feat[:, :15, :]))
    wins = coded_feature_windows(enc["coded"])
    assert wins[0].shape == (1, 19, 36)
    # LPC columns recomputed and finite
    assert np.isfinite(wins[0][..., 20:]).all()
    # ceps columns = coded * MAXI
    # inner 15 rows of the padded window == all 15 coded frames
    np.testing.assert_allclose(
        wins[0][0, 2:-2, :18],
        np.asarray(enc["coded"])[0, :, :18] * 24.1, rtol=1e-5)


def test_train_cb_and_generate_entries(tmp_path):
    """Pipeline: train_cb -> codebooks.npz -> generate_qtz_features."""
    from fpsc_tpu.train import train_cb, generate_qtz_features as gqf
    cfg = Config()
    apply_overrides(cfg, [
        "data.synthetic=true", "data.synthetic_utterances=4",
        "data.chunks=2", "data.batch_size=4",
        "predictor.gru_units1=32", "predictor.gru_units2=16",
        "codec.vq_entries=16,8", "codec.vq_entries_bl=8",
        "codec.scl_entries=8", "codec.scl_entries_bl=4",
        f"codec.codebook_path={tmp_path}/cb.npz",
        "train.debugging=true", f"train.save_dir={tmp_path}",
    ])
    books = train_cb.run(cfg)
    assert books.vq[0].shape == (16, 17)
    assert books.scl.shape == (8,)

    report = gqf.run(cfg, max_utterances=4,
                     out_dir=str(tmp_path / "qtz"))
    assert report["bitrate"] > 0
    assert np.isfinite(report["mse"])
    import glob
    files = glob.glob(str(tmp_path / "qtz" / "train" / "*.npy"))
    assert len(files) == 4
    w = np.load(files[0])
    assert w.shape[1:] == (19, 36)


def test_mask_path_entries_end_to_end(tmp_path):
    """The LEARNED-MASK codec path through the real entry points
    (codec.use_mask=true): train_cb trains books on the mask residual
    split, generate_qtz_features encodes through mask_enc(qtz=True)
    at the hard scale, and the priors-coded rate reports. Mirrors the
    reference's deployed encoder (synthesis_qtz.py:93 scale=1000)."""
    from fpsc_tpu.train import train_cb, generate_qtz_features as gqf
    cfg = Config()
    apply_overrides(cfg, [
        "data.synthetic=true", "data.synthetic_utterances=4",
        "data.chunks=2", "data.batch_size=4",
        "predictor.gru_units1=32", "predictor.gru_units2=16",
        "codec.vq_entries=16,8", "codec.vq_entries_bl=8",
        "codec.scl_entries=8", "codec.scl_entries_bl=4",
        "codec.use_mask=true",
        f"codec.codebook_path={tmp_path}/cb.npz",
        "train.debugging=true", f"train.save_dir={tmp_path}",
    ])
    books = train_cb.run(cfg)
    assert books.vq[0].shape == (16, 17)
    report = gqf.run(cfg, max_utterances=4,
                     out_dir=str(tmp_path / "qtz"))
    assert report["bitrate"] > 0 and np.isfinite(report["mse"])
    assert report["bitrate_priors"] > 0
    # transmit chain roundtrip under the mask path with priors
    from fpsc_tpu.codec import range_coder as rc
    from fpsc_tpu.codec import bitstream as bs
    from fpsc_tpu.train.generate_qtz_features import codebook_sizes
    from fpsc_tpu.models import frame_predictor as fp
    from fpsc_tpu.train.train_frame import build_model
    params = build_model(cfg, jax.random.PRNGKey(cfg.train.seed))
    feat = (np.random.RandomState(3).randn(1, 34, 20) * 0.3
            ).astype(np.float32)
    enc = encode(params, books, jnp.asarray(feat), use_mask=True)
    sizes = codebook_sizes(books)
    ind1 = np.asarray(enc["ind1"])[0]
    ind2 = np.asarray(enc["ind2"])[0]
    idx = {k: np.asarray(v)[0] for k, v in enc["indices"].items()}
    pcodes = bs.quantize_pitch(feat[0, :, 18:] * 24.1)
    pri = report["priors"]
    packed = rc.pack_utterance_rc(ind1, ind2, idx, pcodes, sizes,
                                  priors=pri)
    got = rc.unpack_utterance_rc(packed, sizes, priors=pri)
    np.testing.assert_array_equal(got["ind1"], ind1)
    np.testing.assert_array_equal(got["ind2"], ind2)
    dec = decode(params, books, jnp.asarray(got["ind1"][None]),
                 jnp.asarray(got["ind2"][None]),
                 {k: jnp.asarray(v[None])
                  for k, v in got["indices"].items()},
                 jnp.asarray(feat[..., 18:]))
    np.testing.assert_allclose(np.asarray(dec),
                               np.asarray(enc["coded"]),
                               rtol=1e-5, atol=1e-6)


def test_bitstream_fuzz_random_geometries():
    """Property test: for randomized codebook geometries, stage counts
    and frame streams, BOTH packers (fixed-layout and entropy-coded)
    must round-trip the symbol stream exactly."""
    from fpsc_tpu.codec import bitstream as bs
    from fpsc_tpu.codec import range_coder as rc
    rng = np.random.RandomState(11)
    for trial in range(12):
        n_vq = rng.randint(1, 4)
        n_vq_bl = rng.randint(0, 3)
        sizes = {
            # incl. non-power-of-two sizes: the scalar bucket-chain
            # split and the VQ context hash must handle them
            "scl": int(rng.choice([4, 12, 16, 256])),
            "scl_bl": int(rng.choice([0, 4, 6, 16])),
            "vq": [int(rng.choice([8, 64, 96, 1024]))
                   for _ in range(n_vq)],
            "vq_bl": [int(rng.choice([8, 48, 512]))
                      for _ in range(n_vq_bl)],
        }
        length = rng.randint(1, 40)
        ind1 = rng.rand(length) < rng.rand()
        ind2 = rng.rand(length) < rng.rand()
        idx = {
            "scl": np.where(ind1, rng.randint(sizes["scl"],
                                              size=length), -1),
            "scl_bl": np.where(~ind1 & (sizes["scl_bl"] > 0),
                               rng.randint(max(sizes["scl_bl"], 1),
                                           size=length), -1),
            "vq": np.stack([np.where(ind2, rng.randint(e, size=length),
                                     -1) for e in sizes["vq"]], 1),
            "vq_bl": (np.stack([np.where(~ind2,
                                         rng.randint(e, size=length),
                                         -1) for e in sizes["vq_bl"]],
                               1) if n_vq_bl
                      else np.full((length, 1), -1)),
        }
        # raw-scale pitch within the representable code range
        pitch = np.stack([
            (rng.randint(32, 288, length) - 100.0) / 50.0,
            rng.uniform(-0.5, 0.4, length)], 1)
        pcodes = bs.quantize_pitch(pitch)

        packed = bs.pack_utterance(ind1, ind2, idx, pitch, sizes)
        got = bs.unpack_utterance(packed, sizes)
        packed_rc = rc.pack_utterance_rc(ind1, ind2, idx, pcodes, sizes)
        got_rc = rc.unpack_utterance_rc(packed_rc, sizes)
        # with shared priors (training-usage counts seeding the
        # adaptive tables, incl. the stage-conditioned contexts)
        pri = rc.collect_priors([(ind1, ind2, idx)], sizes)
        packed_pri = rc.pack_utterance_rc(ind1, ind2, idx, pcodes,
                                          sizes, priors=pri)
        got_pri = rc.unpack_utterance_rc(packed_pri, sizes, priors=pri)
        # with RANDOM value-rank orders + full 4-tuple priors (pitch /
        # indicator / corr tables seeded too) — arbitrary codebook
        # orderings must round-trip identically on both sides
        orders = {"scl": rng.permutation(sizes["scl"])}
        if sizes["scl_bl"]:
            orders["scl_bl"] = rng.permutation(sizes["scl_bl"])
        pri4 = rc.collect_priors([(ind1, ind2, idx, pcodes)], sizes,
                                 orders=orders)
        packed_o = rc.pack_utterance_rc(ind1, ind2, idx, pcodes, sizes,
                                        priors=pri4, orders=orders)
        got_o = rc.unpack_utterance_rc(packed_o, sizes, priors=pri4,
                                       orders=orders)

        for g in (got, got_rc, got_pri, got_o):
            np.testing.assert_array_equal(g["ind1"], ind1, err_msg=str(trial))
            np.testing.assert_array_equal(g["ind2"], ind2)
            np.testing.assert_array_equal(
                np.where(ind1, g["indices"]["scl"], -1),
                idx["scl"])
            for s in range(n_vq):
                np.testing.assert_array_equal(
                    np.where(ind2, g["indices"]["vq"][:, s], -1),
                    idx["vq"][:, s])
            for s in range(n_vq_bl):
                np.testing.assert_array_equal(
                    np.where(~ind2, g["indices"]["vq_bl"][:, s], -1),
                    idx["vq_bl"][:, s])
            # pitch decodes through the same 8+3-bit codes
            np.testing.assert_array_equal(
                bs.quantize_pitch(np.asarray(g["pitch"])), pcodes)


def test_rate_control_curve_and_selection(setup):
    """measure_operating_points must produce a monotone
    rate-vs-threshold-scale curve with distortion moving the other
    way (the discriminative-threshold R-D knob the reference fixes at
    one point), and select_scale must interpolate it."""
    from fpsc_tpu.codec import rate_control as rcctl
    params, _, _ = setup
    # production-SIZE books (random entries are fine: the R-D knob is
    # the ~28-bit above-threshold vs ~13-bit below-threshold cost per
    # frame) and streams long enough that per-utterance coder
    # overhead does not dominate
    r = np.random.RandomState(9)
    codebooks = fp.Codebooks(
        scl=jnp.asarray(np.sort(r.randn(256)).astype(np.float32) * .1),
        vq=(jnp.asarray(r.randn(1024, 17).astype(np.float32) * .1),
            jnp.asarray(r.randn(1024, 17).astype(np.float32) * .03)),
        scl_bl=jnp.asarray(np.sort(
            r.randn(16)).astype(np.float32) * .02),
        vq_bl=(jnp.asarray(r.randn(512, 17).astype(np.float32) * .02),),
    )
    feat = (np.random.RandomState(3).randn(2, 200, 20) * 0.3
            ).astype(np.float32)
    points = rcctl.measure_operating_points(
        params, codebooks, feat, scales=(0.5, 1.0, 2.0, 4.0))
    rates = [p["bps"] for p in points]
    mses = [p["mse"] for p in points]
    # raising both thresholds transmits fewer fine symbols
    assert all(a >= b for a, b in zip(rates, rates[1:])), rates
    # and costs distortion (weakly monotone)
    assert mses[0] <= mses[-1], mses
    assert rates[0] > rates[-1], rates

    mid = 0.5 * (rates[1] + rates[2])
    sel = rcctl.select_scale(points, mid)
    assert points[1]["scale"] <= sel["scale"] <= points[2]["scale"]
    assert sel["l1"] / 0.09 == pytest.approx(sel["scale"])
    lo = rcctl.select_scale(points, rates[-1] * 0.5)
    assert lo["scale"] == points[-1]["scale"]
    hi = rcctl.select_scale(points, rates[0] * 2.0)
    assert hi["scale"] == points[0]["scale"]


def test_rate_control_presets_invert_and_pack(setup):
    """Codebook-subset presets (the codec's real rate levers) must
    keep every contract: exact encode->decode inversion with reduced
    books, and bit-exact range-coder roundtrips under the reduced
    sizes dict."""
    from fpsc_tpu.codec import range_coder as rc
    from fpsc_tpu.codec import rate_control as rcctl
    from fpsc_tpu.train.generate_qtz_features import codebook_sizes
    params, cbs, feat = setup
    for name, spec in rcctl.PRESETS.items():
        red = rcctl.preset_codebooks(cbs, **spec)
        if spec["vq_stages"] == 1:
            assert len(red.vq) == 1
        if not spec["vq_bl"]:
            assert red.vq_bl is None
        enc = encode(params, red, jnp.asarray(feat))
        dec = decode(params, red, enc["ind1"], enc["ind2"],
                     enc["indices"], jnp.asarray(feat[..., 18:]))
        np.testing.assert_allclose(
            np.asarray(dec), np.asarray(enc["coded"]),
            rtol=1e-5, atol=1e-6, err_msg=name)
        sizes = codebook_sizes(red)
        orders = rc.scalar_orders(red)
        ind1 = np.asarray(enc["ind1"])[0]
        ind2 = np.asarray(enc["ind2"])[0]
        row = {k: np.asarray(v)[0] for k, v in enc["indices"].items()}
        pcodes = bs.quantize_pitch(feat[0, :, 18:] * 24.1)
        payload = rc.pack_utterance_rc(ind1, ind2, row, pcodes, sizes,
                                       orders=orders)
        un = rc.unpack_utterance_rc(payload, sizes, orders=orders)
        np.testing.assert_array_equal(un["ind1"], ind1, err_msg=name)
        np.testing.assert_array_equal(un["ind2"], ind2, err_msg=name)
        for k in ("scl", "scl_bl", "vq", "vq_bl"):
            if sizes.get(k) in ([], 0):
                continue
            got = np.asarray(un["indices"][k])
            np.testing.assert_array_equal(
                got.reshape(row[k].shape), row[k],
                err_msg=f"{name}:{k}")


def test_decimated_encode_round_trips_through_conceal(setup):
    """The ultra presets' frame decimation: encoder send-mask ->
    pack only kept frames -> expand -> conceal_decode free-run is
    EXACTLY the encoder's own coded track (closed-loop consistency),
    and the packed rate scales with the duty cycle."""
    from fpsc_tpu.codec import plc
    from fpsc_tpu.codec import range_coder as rc
    from fpsc_tpu.codec import rate_control as rcctl
    from fpsc_tpu.train.generate_qtz_features import codebook_sizes
    params, cbs, feat = setup
    red = rcctl.preset_codebooks(cbs, **rcctl.PRESETS["ultra"])
    length = feat.shape[1]
    send = rcctl.send_pattern(length, 3)
    assert send[0] and not send[2] and send.mean() == pytest.approx(
        2 / 3, abs=0.05)
    enc = encode(params, red, jnp.asarray(feat), send=jnp.asarray(send))
    sizes = codebook_sizes(red)
    orders = rc.scalar_orders(red)

    ind1 = np.asarray(enc["ind1"])[0]
    ind2 = np.asarray(enc["ind2"])[0]
    row = {k: np.asarray(v)[0] for k, v in enc["indices"].items()}
    pcodes = bs.quantize_pitch(feat[0, :, 18:] * 24.1)
    assert not ind1[~send].any() and row["scl"][~send].max() == -1

    di1, di2, didx, dpc = rcctl.decimate_streams(ind1, ind2, row,
                                                 pcodes, send)
    payload = rc.pack_utterance_rc(di1, di2, didx, dpc, sizes,
                                   orders=orders)
    full = rc.pack_utterance_rc(ind1, ind2, row, pcodes, sizes,
                                orders=orders)
    assert len(payload) < 0.85 * len(full), (len(payload), len(full))

    un = rc.unpack_utterance_rc(payload, sizes, orders=orders)
    un["pitch"] = bs.dequantize_pitch(dpc)
    exp = rcctl.expand_streams(un, send)
    np.testing.assert_array_equal(exp["ind1"], ind1)
    np.testing.assert_array_equal(exp["lost"], ~send)
    for k in ("scl", "vq"):
        np.testing.assert_array_equal(exp["indices"][k], row[k],
                                      err_msg=k)
    con = plc.conceal_decode(
        params, red, jnp.asarray(exp["ind1"][None]),
        jnp.asarray(exp["ind2"][None]),
        {k: jnp.asarray(v[None]) for k, v in exp["indices"].items()},
        jnp.asarray(feat[:1, :, 18:]), jnp.asarray(exp["lost"][None]),
        damp=1.0, energy_cap=False, fade_step=0.0)
    np.testing.assert_allclose(
        np.asarray(con)[0, :, :18],
        np.asarray(enc["coded"])[0, :, :18], rtol=1e-5, atol=1e-6)


def test_coarsen_scalar_preserves_range_and_order():
    from fpsc_tpu.codec import rate_control as rcctl
    cb = jnp.asarray(np.sort(np.random.RandomState(0).randn(256))
                     .astype(np.float32))
    c = np.asarray(rcctl.coarsen_scalar(cb, 64))
    assert c.shape == (64,)
    assert c[0] == np.asarray(cb)[0] and c[-1] == np.asarray(cb)[-1]
    assert (np.diff(c) > 0).all()
    # no-op when already coarse enough
    assert rcctl.coarsen_scalar(cb, 256) is cb


def test_measure_operating_points_decimated(setup):
    """decimate=3 rate sits well below the same preset undecimated,
    and the point dict records the pattern for deployment."""
    from fpsc_tpu.codec import rate_control as rcctl
    params, cbs, feat = setup
    red = rcctl.preset_codebooks(cbs, **rcctl.PRESETS["ultra"])
    pts_dec = rcctl.measure_operating_points(
        params, red, jnp.asarray(feat), scales=(1.0,), preset="ultra",
        decimate=3)
    pts_full = rcctl.measure_operating_points(
        params, red, jnp.asarray(feat), scales=(1.0,), preset="lean+")
    assert pts_dec[0]["decimate"] == 3
    assert pts_dec[0]["bps"] < 0.85 * pts_full[0]["bps"], (
        pts_dec[0]["bps"], pts_full[0]["bps"])
    assert pts_dec[0]["mse"] >= pts_full[0]["mse"]


def test_rate_control_frontier_and_preset_selection():
    """pareto_frontier keeps exactly the non-dominated points;
    select_preset returns the best-quality point within budget and
    degrades to the cheapest point when the target is unreachable."""
    from fpsc_tpu.codec import rate_control as rcctl
    pts = [
        {"preset": "a", "scale": 1.0, "bps": 800.0, "mse": 1e-3},
        {"preset": "a", "scale": 0.5, "bps": 1000.0, "mse": 5e-4},
        {"preset": "b", "scale": 1.0, "bps": 1000.0, "mse": 7e-4},
        {"preset": "b", "scale": 0.5, "bps": 1200.0, "mse": 6e-4},
        {"preset": "c", "scale": 1.0, "bps": 1400.0, "mse": 2e-4},
    ]
    front = rcctl.pareto_frontier(pts)
    assert [(p["bps"], p["mse"]) for p in front] == [
        (800.0, 1e-3), (1000.0, 5e-4), (1400.0, 2e-4)]
    assert rcctl.select_preset(pts, 1300.0)["bps"] == 1000.0
    assert rcctl.select_preset(pts, 1400.0)["bps"] == 1400.0
    assert rcctl.select_preset(pts, 500.0)["bps"] == 800.0
