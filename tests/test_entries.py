"""Smoke tests for the remaining training / synthesis entry points."""
import glob
import os

import numpy as np
import pytest

from fpsc_tpu.config.config import Config, apply_overrides


def _tiny_cfg(tmp_path, extra=()):
    cfg = Config()
    apply_overrides(cfg, [
        "data.synthetic=true", "data.synthetic_utterances=2",
        "data.chunks=1", "data.batch_size=2",
        "wavenet.num_blocks=1", "wavenet.num_layers=2",
        "wavenet.residual_channels=8", "wavenet.gate_channels=12",
        "wavenet.skip_channels=8", "wavenet.cout_channels=12",
        "wavenet.front_kernel=4",
        "iaf.num_flows=2", "iaf.num_layers=2",
        "iaf.residual_channels=8", "iaf.gate_channels=12",
        "iaf.skip_channels=8", "iaf.cout_channels=12",
        "lpcnet.gru_a_units=16", "lpcnet.gru_b_units=8",
        "lpcnet.embed_dim=8", "lpcnet.cond_units=8",
        "predictor.gru_units1=16", "predictor.gru_units2=8",
        "train.epochs=1", "train.debugging=true",
        f"train.save_dir={tmp_path}",
        *extra,
    ])
    return cfg


def test_train_vocoder_entry(tmp_path):
    from fpsc_tpu.train import train_vocoder as tv
    params, loss = tv.run(_tiny_cfg(tmp_path))
    assert np.isfinite(loss)


def test_train_vocoder_upd_f_only_freezes_core(tmp_path):
    import jax
    import optax
    from fpsc_tpu.train import train_vocoder as tv
    from fpsc_tpu.models import wavenet as wn
    cfg = _tiny_cfg(tmp_path, ["train.upd_f_only=true"])
    mcfg = tv.model_config(cfg)
    params = wn.init_wavenet(jax.random.PRNGKey(0), mcfg)
    tx = tv.build_optimizer(cfg, params)
    opt_state = tx.init(params)
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(1, 2, 20).astype(np.float32))
    periods = jnp.asarray(rng.randint(32, 256, (1, 2)).astype(np.int32))
    x = jnp.asarray(rng.randn(1, 320).astype(np.float32) * 0.1)
    lpc = jnp.asarray(rng.randn(1, 2, 16).astype(np.float32) * 0.05)
    loss, grads = jax.value_and_grad(tv.loss_fn)(
        params, mcfg, feat, periods, x, lpc)
    updates, _ = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(
        np.asarray(new_params.front.v), np.asarray(params.front.v))
    assert not np.array_equal(
        np.asarray(new_params.upsampler.c_conv1.v),
        np.asarray(params.upsampler.c_conv1.v))


def test_train_all_entry(tmp_path):
    from fpsc_tpu.train import train_all as ta
    fp_params, wn_params, loss = ta.run(_tiny_cfg(tmp_path))
    assert np.isfinite(loss)


def test_train_iaf_entry(tmp_path):
    from fpsc_tpu.train import train_iaf as ti
    params, loss = ti.run(_tiny_cfg(tmp_path))
    assert np.isfinite(loss)


def test_synthesis_entry(tmp_path):
    from fpsc_tpu.train import synthesis as syn
    outs = syn.run(_tiny_cfg(tmp_path), num_samples=1,
                   out_dir=str(tmp_path / "wav"))
    assert len(outs) == 1
    wavs = glob.glob(str(tmp_path / "wav" / "*.wav"))
    assert len(wavs) == 2  # truth + xout
    import wave
    with wave.open(wavs[0]) as w:
        assert w.getframerate() == 16000


def test_synthesis_qtz_full_codec(tmp_path):
    """End-to-end codec: train books -> encode -> pack -> decode ->
    LPCNet vocoder -> wav."""
    from fpsc_tpu.train import train_cb, synthesis_qtz as sq
    cfg = _tiny_cfg(tmp_path, [
        "codec.vq_entries=8,8", "codec.vq_entries_bl=8",
        "codec.scl_entries=8", "codec.scl_entries_bl=4",
        f"codec.codebook_path={tmp_path}/cb.npz",
    ])
    train_cb.run(cfg)
    results = sq.run(cfg, num_samples=1,
                     out_dir=str(tmp_path / "qtz"), use_pallas=False)
    assert len(results) == 1
    r = results[0]
    assert r["bitrate"] > 100
    assert np.isfinite(r["wav"]).all()
    assert os.path.exists(str(tmp_path / "qtz" / f"{r['name']}_dec.wav"))
    feats = np.load(str(tmp_path / "qtz" / f"{r['name']}_features.npy"))
    assert feats.shape[1:] == (19, 36)


def test_frame_evaluation_entry(tmp_path):
    from fpsc_tpu.train import frame_evaluation as fe
    report = fe.run(_tiny_cfg(tmp_path), max_batches=1)
    assert set(report) == {"spec", "spec_out", "adj_res_tr",
                           "adj_res_out", "residual"}
    assert all(np.isfinite(v) for v in report.values())


def test_lpcnet_finetune_on_coded_features(tmp_path):
    """The --quantize-style chain: train codebooks -> dump coded
    features -> finetune the vocoder's frame net on them."""
    from fpsc_tpu.train import train_cb, generate_qtz_features as gqf
    from fpsc_tpu.train import train_lpcnet as tl
    cfg = _tiny_cfg(tmp_path, [
        "codec.vq_entries=8,8", "codec.vq_entries_bl=8",
        "codec.scl_entries=8", "codec.scl_entries_bl=4",
        f"codec.codebook_path={tmp_path}/cb.npz",
        "train.upd_f_only=true",
    ])
    train_cb.run(cfg)
    out = gqf.run(cfg, max_utterances=2, out_dir=str(tmp_path / "qtz"))
    params, loss = tl.run(cfg, data_dir=out["out_dir"])
    assert np.isfinite(loss)


def test_synthesis_qtz_deploys_bunched_vocoder_checkpoint(tmp_path):
    """CLI deployment of the bunched production vocoder: train a tiny
    bunched model (lpcnet.bunch=2), save its checkpoint, and drive
    synthesis_qtz through train.vocoder_model - the entry must build
    the BunchedParams structure, load the checkpoint into it, and
    synthesise through the kernel's bunch=2 dispatch."""
    from fpsc_tpu.models import lpcnet_bunched
    from fpsc_tpu.train import train_cb, train_lpcnet as tl
    from fpsc_tpu.train import synthesis_qtz as sq
    cfg = _tiny_cfg(tmp_path, [
        "codec.vq_entries=8,8", "codec.vq_entries_bl=8",
        "codec.scl_entries=8", "codec.scl_entries_bl=4",
        f"codec.codebook_path={tmp_path}/cb.npz",
        "lpcnet.bunch=2",
    ])
    cfg.train.debugging = False      # must write a checkpoint
    params, _ = tl.run(cfg)
    assert isinstance(params, lpcnet_bunched.BunchedParams)
    train_cb.run(cfg)
    cfg.train.vocoder_model = cfg.label + "_s"
    cfg.train.vocoder_epoch = 0
    results = sq.run(cfg, num_samples=1,
                     out_dir=str(tmp_path / "qtzb"), use_pallas=False)
    assert len(results) == 1
    assert np.isfinite(results[0]["wav"]).all()


def test_diagnostic_images_dumped(tmp_path):
    """train.plot_every dumps the reference's inspection images
    (feature heatmaps from train_frame, excitation traces +
    spectrogram from train_lpcnet) under <save_dir>/<label>/
    diagnostics/ (utils/diagnostics.py; reference
    src/train_frame.py:95-114, train.py:153-165)."""
    from fpsc_tpu.train import train_frame as tf
    from fpsc_tpu.train import train_lpcnet as tl

    cfg = _tiny_cfg(tmp_path, ["train.plot_every=1",
                               "label=diagf"])
    tf.run(cfg)
    d = tmp_path / "diagf" / "diagnostics"
    assert (d / "feat_0.png").exists()
    assert (d / "feat_out_0.png").exists()

    cfg = _tiny_cfg(tmp_path, ["train.plot_every=1",
                               "label=diagv"])
    tl.run(cfg)
    d = tmp_path / "diagv_s" / "diagnostics"
    assert (d / "exc_0.png").exists()
    assert (d / "exc_out_0.png").exists()
    assert (d / "signal_0.png").exists()
