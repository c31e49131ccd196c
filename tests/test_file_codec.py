"""File codec tests: .fpsc container format, wav -> file -> wav
round trip through the CLI functions, rate presets, geometry safety,
and a real two-process CLI round trip (encoder and decoder sharing
only the artifact files, like a deployed codec)."""
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpsc_tpu.codec import cli, container
from fpsc_tpu.config.config import Config, apply_overrides

TINY = [
    "predictor.gru_units1=32", "predictor.gru_units2=16",
    "lpcnet.gru_a_units=32", "lpcnet.gru_b_units=8",
    "lpcnet.embed_dim=16", "lpcnet.cond_units=16",
]


def _write_artifacts(tmp_path):
    from fpsc_tpu.models import frame_predictor as fp
    from fpsc_tpu.train import checkpoint as ckpt
    r = np.random.RandomState(5)
    cbs = fp.Codebooks(
        scl=jnp.asarray(np.sort(r.randn(16)).astype(np.float32) * 0.1),
        vq=(jnp.asarray(r.randn(32, 17).astype(np.float32) * 0.1),
            jnp.asarray(r.randn(16, 17).astype(np.float32) * 0.03)),
        scl_bl=jnp.asarray(np.sort(r.randn(4)).astype(np.float32)
                           * 0.02),
        vq_bl=(jnp.asarray(r.randn(8, 17).astype(np.float32) * 0.02),),
    )
    cb_path = str(tmp_path / "cb.npz")
    ckpt.save_codebooks(cb_path, cbs)
    return cb_path


def _write_wav(tmp_path, name="utt", seconds=0.6, seed=7):
    from fpsc_tpu.data.synthetic import speech_like_waveform
    from fpsc_tpu.train.synthesis import save_wav
    x = speech_like_waveform(np.random.RandomState(seed),
                             int(16000 * seconds))
    x = np.asarray(x, np.float32)
    x /= max(1e-9, 1.1 * np.abs(x).max())
    path = str(tmp_path / f"{name}.wav")
    save_wav(path, x)
    return path


def _cfg(cb_path, extra=()):
    cfg = Config()
    apply_overrides(cfg, TINY + [
        f"codec.codebook_path={cb_path}", *extra])
    return cfg


def test_container_roundtrip(tmp_path):
    sizes = {"scl": 256, "scl_bl": 16, "vq": [1024, 512],
             "vq_bl": [512]}
    utts = [("a", b"\x01\x02\x03"), ("b", bytes(range(200)))]
    path = str(tmp_path / "x.fpsc")
    n = container.write_fpsc(path, utts, sizes, entropy=True,
                             use_mask=True, l1=0.11, l2=0.3,
                             mask_scale=500.0, preset="lean")
    assert os.path.getsize(path) == n
    box = container.read_fpsc(path)
    assert box["utterances"] == utts
    m = box["meta"]
    assert m["sizes"] == sizes
    assert m["entropy"] and m["use_mask"]
    assert m["preset"] == "lean"
    assert m["l1"] == pytest.approx(0.11)
    assert m["mask_scale"] == pytest.approx(500.0)
    container.check_geometry(m, sizes)
    with pytest.raises(ValueError, match="do not match"):
        container.check_geometry(m, {**sizes, "vq": [1024]})


def test_container_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.fpsc")
    with open(path, "wb") as f:
        f.write(b"NOPE" + b"\x00" * 16)
    with pytest.raises(ValueError, match="magic"):
        container.read_fpsc(path)


def test_file_codec_roundtrip(tmp_path):
    """encode_paths -> .fpsc -> decode_file reproduces the exact coded
    features of the direct in-process encode (the bitstream is the
    only carrier), and emits finite audio."""
    from fpsc_tpu.codec.codec import decode, encode
    from fpsc_tpu.dsp import constants as C
    from fpsc_tpu.dsp.frontend import extract_features

    cb_path = _write_artifacts(tmp_path)
    wavs = [_write_wav(tmp_path, "u1", seed=7),
            _write_wav(tmp_path, "u2", seed=8)]
    cfg = _cfg(cb_path)
    arts = cli.load_artifacts(cfg)
    out = str(tmp_path / "s.fpsc")
    rep = cli.encode_paths(cfg, wavs, out, artifacts=arts)
    assert all(r > 0 for r in rep["rates"].values())

    voc = cli._load_vocoder(cfg, __import__(
        "fpsc_tpu.train.checkpoint", fromlist=["checkpoint"]))
    res = cli.decode_file(cfg, out, str(tmp_path / "dec"),
                          use_pallas=False, artifacts=arts,
                          vocoder_params=voc)
    assert [r["name"] for r in res] == ["u1", "u2"]
    for r, wav in zip(res, wavs):
        assert np.isfinite(r["wav"]).all() and r["wav"].std() > 0
        assert os.path.exists(tmp_path / "dec" / f"{r['name']}.wav")
        # oracle: direct in-process encode->decode of the same wav.
        # Both codec sides condition on the DEQUANTIZED pitch (what
        # the stream carries), so encode->decode is an exact inverse.
        from fpsc_tpu.codec import bitstream as bs
        x = cli.read_wav(wav)
        rows = np.asarray(extract_features(jnp.asarray(x)))
        pitch_dq = bs.dequantize_pitch(
            bs.quantize_pitch(rows[:, 18:20]))
        feat = jnp.asarray(np.concatenate(
            [rows[:, :18], pitch_dq], axis=1)[None] / C.MAXI)
        enc = encode(arts[0], arts[1], feat, l1=cfg.codec.l1,
                     l2=cfg.codec.l2)
        dec = decode(arts[0], arts[1], enc["ind1"], enc["ind2"],
                     enc["indices"], feat[..., 18:])
        np.testing.assert_allclose(r["coded"], np.asarray(dec)[0],
                                   rtol=1e-4, atol=1e-5)


def test_file_codec_mask_path_roundtrip(tmp_path):
    """The learned-mask encoder (the reference's deployed path) rides
    the same container: flags round-trip and decode works from the
    stream alone."""
    cb_path = _write_artifacts(tmp_path)
    wav = _write_wav(tmp_path, "u1", seed=12)
    cfg = _cfg(cb_path, ["codec.use_mask=true", "codec.mask_scale=500"])
    arts = cli.load_artifacts(cfg)
    out = str(tmp_path / "m.fpsc")
    cli.encode_paths(cfg, [wav], out, artifacts=arts)
    meta = container.read_fpsc(out)["meta"]
    assert meta["use_mask"] and meta["mask_scale"] == pytest.approx(500)
    voc = cli._load_vocoder(cfg, __import__(
        "fpsc_tpu.train.checkpoint", fromlist=["checkpoint"]))
    res = cli.decode_file(cfg, out, str(tmp_path / "dec_m"),
                          use_pallas=False, artifacts=arts,
                          vocoder_params=voc)
    assert np.isfinite(res[0]["wav"]).all() and res[0]["wav"].std() > 0


def test_file_codec_preset_reduces_rate(tmp_path):
    cb_path = _write_artifacts(tmp_path)
    wav = _write_wav(tmp_path, "u1", seed=9)
    full = _cfg(cb_path)
    lean = _cfg(cb_path, ["codec.preset=lean"])
    out_f = str(tmp_path / "f.fpsc")
    out_l = str(tmp_path / "l.fpsc")
    rep_f = cli.encode_paths(full, [wav], out_f)
    rep_l = cli.encode_paths(lean, [wav], out_l)
    assert rep_l["rates"]["u1"] < rep_f["rates"]["u1"]
    # decoding the lean stream against FULL artifacts must fail loudly
    arts = cli.load_artifacts(full)
    with pytest.raises(ValueError, match="do not match"):
        cli.decode_file(full, out_l, str(tmp_path / "x"),
                        artifacts=arts, vocoder_params=None)
    # and correctly against the lean preset
    arts_l = cli.load_artifacts(lean)
    voc = cli._load_vocoder(lean, __import__(
        "fpsc_tpu.train.checkpoint", fromlist=["checkpoint"]))
    res = cli.decode_file(lean, out_l, str(tmp_path / "dec_l"),
                          use_pallas=False, artifacts=arts_l,
                          vocoder_params=voc)
    assert np.isfinite(res[0]["wav"]).all()


def test_file_codec_cli_two_processes(tmp_path):
    """Real deployment shape: encoder and decoder run in SEPARATE
    processes sharing only the artifact files and the .fpsc stream."""
    cb_path = _write_artifacts(tmp_path)
    wav = _write_wav(tmp_path, "utt", seconds=0.5, seed=11)
    out = str(tmp_path / "s.fpsc")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    common = TINY + [f"codec.codebook_path={cb_path}"]
    r1 = subprocess.run(
        [sys.executable, "-m", "fpsc_tpu.codec.cli", "encode", out,
         wav] + common, capture_output=True, text=True, env=env,
        timeout=600)
    assert r1.returncode == 0, r1.stderr
    assert os.path.exists(out)
    r2 = subprocess.run(
        [sys.executable, "-m", "fpsc_tpu.codec.cli", "decode", out,
         str(tmp_path / "dec")] + common, capture_output=True,
        text=True, env=env, timeout=600)
    assert r2.returncode == 0, r2.stderr
    dec_wav = tmp_path / "dec" / "utt.wav"
    assert dec_wav.exists()
    y = cli.read_wav(str(dec_wav))
    assert np.isfinite(y).all() and y.std() > 0


def test_file_codec_packetized_lossless_matches_plain(tmp_path):
    """codec.packet_ms writes independently decodable packets; with no
    loss the decode equals the whole-utterance stream's bit-exactly."""
    cb_path = _write_artifacts(tmp_path)
    wavs = [_write_wav(tmp_path, "p1", seed=9)]
    arts = cli.load_artifacts(_cfg(cb_path))
    voc = cli._load_vocoder(_cfg(cb_path), __import__(
        "fpsc_tpu.train.checkpoint", fromlist=["checkpoint"]))

    plain_cfg = _cfg(cb_path)
    plain_out = str(tmp_path / "plain.fpsc")
    cli.encode_paths(plain_cfg, wavs, plain_out, artifacts=arts)
    ref = cli.decode_file(plain_cfg, plain_out, str(tmp_path / "d0"),
                          use_pallas=False, artifacts=arts,
                          vocoder_params=voc)

    pkt_cfg = _cfg(cb_path, ["codec.packet_ms=50"])
    pkt_out = str(tmp_path / "pkt.fpsc")
    rep = cli.encode_paths(pkt_cfg, wavs, pkt_out, artifacts=arts)
    box = container.read_fpsc(pkt_out)
    assert box["meta"]["packet_frames"] == 5
    assert isinstance(box["utterances"][0][1], list)
    got = cli.decode_file(pkt_cfg, pkt_out, str(tmp_path / "d1"),
                          use_pallas=False, artifacts=arts,
                          vocoder_params=voc)
    np.testing.assert_array_equal(got[0]["coded"], ref[0]["coded"])


def test_file_codec_fec_survives_simulated_loss(tmp_path):
    """codec.fec + decode-side codec.sim_drop: the recovered decode
    stays close to the lossless one (FEC covers isolated drops), and
    the plain-packet arm under the SAME channel drifts further."""
    cb_path = _write_artifacts(tmp_path)
    wavs = [_write_wav(tmp_path, "f1", seconds=1.0, seed=11)]
    arts = cli.load_artifacts(_cfg(cb_path))
    voc = cli._load_vocoder(_cfg(cb_path), __import__(
        "fpsc_tpu.train.checkpoint", fromlist=["checkpoint"]))

    fec_cfg = _cfg(cb_path, ["codec.packet_ms=50", "codec.fec=true"])
    fec_out = str(tmp_path / "fec.fpsc")
    cli.encode_paths(fec_cfg, wavs, fec_out, artifacts=arts)
    assert container.read_fpsc(fec_out)["meta"]["fec"]

    ref = cli.decode_file(fec_cfg, fec_out, str(tmp_path / "r"),
                          use_pallas=False, artifacts=arts,
                          vocoder_params=voc)[0]["coded"]

    lossy_cfg = _cfg(cb_path, ["codec.packet_ms=50", "codec.fec=true",
                               "codec.sim_drop=0.25",
                               "codec.sim_seed=3"])
    got = cli.decode_file(lossy_cfg, fec_out, str(tmp_path / "l"),
                          use_pallas=False, artifacts=arts,
                          vocoder_params=voc)[0]["coded"]

    plain_cfg = _cfg(cb_path, ["codec.packet_ms=50"])
    plain_out = str(tmp_path / "pl.fpsc")
    cli.encode_paths(plain_cfg, wavs, plain_out, artifacts=arts)
    lossy_plain = _cfg(cb_path, ["codec.packet_ms=50",
                                 "codec.sim_drop=0.25",
                                 "codec.sim_seed=3"])
    got_plain = cli.decode_file(lossy_plain, plain_out,
                                str(tmp_path / "lp"),
                                use_pallas=False, artifacts=arts,
                                vocoder_params=voc)[0]["coded"]

    e_fec = np.abs(got[..., :18] - ref[..., :18]).mean()
    e_plain = np.abs(got_plain[..., :18] - ref[..., :18]).mean()
    assert np.isfinite(got).all()
    assert e_fec < e_plain, (e_fec, e_plain)


def test_container_packetized_records_frame_counts(tmp_path):
    """v2 containers record each utterance's total frame count in
    packet mode (so a dropped final SHORT packet decodes to the true
    length) and refuse to write packetized streams without it."""
    sizes = {"scl": 16, "scl_bl": 4, "vq": [32], "vq_bl": [8]}
    utts = [("a", [b"\x05xx", b"\x03y"]), ("b", [b"\x05z"])]
    path = str(tmp_path / "p.fpsc")
    container.write_fpsc(path, utts, sizes, packet_frames=5,
                         frame_counts={"a": 8, "b": 5})
    box = container.read_fpsc(path)
    assert box["meta"]["frame_counts"] == {"a": 8, "b": 5}
    assert box["utterances"] == utts
    with pytest.raises(ValueError, match="frame_counts"):
        container.write_fpsc(str(tmp_path / "q.fpsc"), utts, sizes,
                             packet_frames=5)
    # non-packet containers don't carry counts (length rides in the
    # payload header already)
    container.write_fpsc(str(tmp_path / "r.fpsc"),
                         [("a", b"abc")], sizes)
    assert container.read_fpsc(
        str(tmp_path / "r.fpsc"))["meta"]["frame_counts"] == {}


def test_encode_paths_rejects_duplicate_basenames(tmp_path):
    cb_path = _write_artifacts(tmp_path)
    d1 = tmp_path / "d1"
    d2 = tmp_path / "d2"
    d1.mkdir()
    d2.mkdir()
    w1 = _write_wav(d1, "same", seed=7)
    w2 = _write_wav(d2, "same", seed=8)
    with pytest.raises(ValueError, match="duplicate"):
        cli.encode_paths(_cfg(cb_path), [w1, w2],
                         str(tmp_path / "dup.fpsc"))
