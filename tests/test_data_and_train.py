"""Data layer, frontend, and minimum end-to-end training slice."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpsc_tpu.config.config import Config, apply_overrides
from fpsc_tpu.data import f32 as f32mod
from fpsc_tpu.data.dataset import build_dataset, predictor_inputs
from fpsc_tpu.dsp import constants as C


def test_window_flatten_repack_roundtrip():
    rng = np.random.RandomState(0)
    frames = rng.randn(15 * 6 + 4, 36).astype(np.float32)
    windows = f32mod.window_features(frames)
    assert windows.shape == (6, 19, 36)
    # window i starts at frame 15*i
    np.testing.assert_array_equal(windows[2, 0], frames[30])
    flat = f32mod.flatten_windows(windows)
    assert flat.shape == (6 * 15 + 4, 36)
    np.testing.assert_array_equal(flat, frames)
    repacked = f32mod.repack_windows(flat, 6)
    np.testing.assert_array_equal(repacked, windows)


def test_f32_io_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    frames = rng.randn(50, 36).astype(np.float32)
    p = str(tmp_path / "utt.f32")
    f32mod.write_f32(p, frames)
    np.testing.assert_array_equal(f32mod.read_f32(p), frames)


def test_frontend_features_shape_and_pitch_recovery():
    from fpsc_tpu.dsp.frontend import extract_features_np
    from fpsc_tpu.data.synthetic import synth_waveform
    x = synth_waveform(np.random.RandomState(3), 16000)
    feats = extract_features_np(x)
    assert feats.shape[1] == 36
    assert np.isfinite(feats).all()
    # pitch feature must recover an integer period in [32, 256] via the
    # reference formula int(.1 + 50*f + 100)
    periods = (0.1 + 50 * feats[:, 18] + 100).astype(np.int32)
    assert periods.min() >= 32 and periods.max() <= 256
    # f0 of the synthetic source is 60..180 Hz -> period 88..266; most
    # voiced frames should land in that band
    voiced = feats[:, 19] > 0.2
    assert voiced.mean() > 0.5
    assert np.median(periods[voiced]) > 60


def test_frontend_cepstra_invert_through_ceps2lpc():
    """LPC from our cepstra must actually whiten the synthetic signal:
    prediction residual energy well below signal energy.  The analysis
    (and hence the LPC) lives in the pre-emphasis domain, so the
    whitening check runs on the pre-emphasised signal - exactly the
    waveform the vocoder trains on."""
    from fpsc_tpu.dsp.frontend import extract_features_np
    from fpsc_tpu.data.synthetic import synth_waveform
    from fpsc_tpu.dsp.emphasis import preemphasis
    from fpsc_tpu.dsp.lpc import lpc_pred
    x = synth_waveform(np.random.RandomState(5), 16000)
    feats = extract_features_np(x)
    n = feats.shape[0] - 1
    xs = preemphasis(x)[: n * 160][None]
    lpc = feats[:n, 20:][None]
    pred = np.asarray(lpc_pred(jnp.asarray(xs), jnp.asarray(lpc)))
    exc = xs - np.roll(pred, 1, -1)
    # pre-emphasis itself removes most of the spectral tilt, so the
    # in-domain LPC gain is modest; the invariant is the TOTAL chain
    # gain (raw signal energy vs excitation energy = the coding gain
    # of pre-emphasis + LPC together) plus LPC not hurting.
    e_exc = max(np.sum(exc[0, 320:] ** 2), 1e-9)
    gain_lpc = np.sum(xs[0, 320:] ** 2) / e_exc
    gain_chain = np.sum(x[320:n * 160] ** 2) / e_exc
    assert gain_lpc > 1.0, f"LPC hurts in preemph domain: {gain_lpc}"
    assert gain_chain > 3.0, f"chain prediction gain too low: {gain_chain}"


def test_head_aligned_batches_pair_with_waveform_head():
    """head=True crops deterministically at offset 0, so coded-feature
    dumps stay aligned with the waveform for the vocoder finetune
    (train_lpcnet.coded_dataset pairs windows with utt.waveform[:n*2400];
    the round-2 bug was generate_qtz_features saving RANDOM crops)."""
    from fpsc_tpu.data.dataset import build_dataset
    from fpsc_tpu.data import f32 as f32mod
    cfg = Config()
    apply_overrides(cfg, ["data.synthetic=true",
                          "data.synthetic_utterances=3",
                          "data.chunks=2", "data.batch_size=3"])
    ds = build_dataset(cfg.data, "train")
    batch = next(ds.iter_batches(3, seed=0, head=True))
    by_name = {u.name: u for u in ds.items}
    for i, name in enumerate(batch["name"]):
        utt = by_name[name]
        np.testing.assert_array_equal(
            batch["x"][i], utt.waveform[:2 * 2400])
        np.testing.assert_array_equal(
            batch["feat"][i], f32mod.flatten_windows(utt.windows[:2]))
    # random crops (default) do move
    b2 = next(ds.iter_batches(3, seed=1, head=False))
    assert any(not np.array_equal(b2["x"][i],
                                  by_name[b2["name"][i]].waveform[:4800])
               for i in range(3))


def test_synthetic_dataset_batches():
    cfg = Config()
    apply_overrides(cfg, ["data.synthetic=true",
                          "data.synthetic_utterances=4",
                          "data.chunks=3", "data.batch_size=2"])
    ds = build_dataset(cfg.data, "train")
    batch = next(ds.iter_batches(2, seed=0))
    assert batch["x"].shape == (2, 3 * 2400)
    assert batch["feat"].shape == (2, 3 * 15 + 4, 36)
    np.testing.assert_allclose(batch["nm_feat"], batch["feat"] / 24.1)
    inp = predictor_inputs(batch)
    assert inp.shape == (2, 45, 20)
    # determinism
    batch2 = next(build_dataset(cfg.data, "train").iter_batches(2, seed=0))
    np.testing.assert_array_equal(batch["x"], batch2["x"])


def test_speech_hard_style_properties():
    """The stress fixture (multi-speaker vocal tracts, 80-320 Hz f0
    classes, additive-noise conditions) must produce valid feature
    tracks with speaker diversity the 'speech' style lacks."""
    from fpsc_tpu.data.synthetic import synth_utterance
    periods = []
    for seed in range(6):
        x, w = synth_utterance(seed, 3, "speech_hard")
        assert np.isfinite(x).all() and np.isfinite(w).all()
        assert np.abs(x).max() <= 1.0
        corr = w[..., 19].ravel() + 0.5
        assert float(np.mean(corr > 0.6)) > 0.3   # voiced content
        p = w[..., 18].ravel() * 50 + 100
        periods.append(float(np.median(p[corr > 0.6])))
    # speaker classes spread the median period widely across seeds
    assert max(periods) - min(periods) > 30.0, periods
    # deterministic per seed
    x0, w0 = synth_utterance(0, 3, "speech_hard")
    x1, w1 = synth_utterance(0, 3, "speech_hard")
    np.testing.assert_array_equal(x0, x1)


def test_train_frame_slice(tmp_path):
    """Minimum end-to-end slice: synthetic data -> warmup + mask-phase
    training steps under the device mesh -> loss decreases."""
    from fpsc_tpu.train import train_frame as tf
    cfg = Config()
    apply_overrides(cfg, [
        "data.synthetic=true", "data.synthetic_utterances=6",
        "data.chunks=2", "data.batch_size=3",
        "predictor.gru_units1=32", "predictor.gru_units2=16",
        "train.epochs=2", "train.warmup_batches=0",
        f"train.save_dir={tmp_path}",
    ])
    params, min_loss = tf.run(cfg)
    assert np.isfinite(min_loss)
    # checkpoint written and loadable
    from fpsc_tpu.train import checkpoint as ckpt
    payload = ckpt.load(ckpt.checkpoint_path(str(tmp_path), cfg.label, 1))
    assert payload["step"] == 1

    # training reduces the warmup loss on a fixed batch
    ds = build_dataset(cfg.data, "train")
    feat = jnp.asarray(predictor_inputs(next(ds.iter_batches(3, seed=9))))
    fresh = tf.build_model(cfg, jax.random.PRNGKey(cfg.train.seed))
    assert float(tf.warmup_loss(params, feat)) < float(
        tf.warmup_loss(fresh, feat))


def test_config_overrides():
    cfg = Config()
    apply_overrides(cfg, ["train.learning_rate=0.01", "data.chunks=5",
                          "codec.vq_entries=64,32",
                          "train.debugging=true"])
    assert cfg.train.learning_rate == 0.01
    assert cfg.data.chunks == 5
    assert cfg.codec.vq_entries == (64, 32)
    assert cfg.train.debugging is True
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["train.nope=1"])


def test_prepare_cli(tmp_path):
    """audio -> .f32 preparation CLI feeds the dataset loader."""
    from fpsc_tpu.data.prepare import prepare
    from fpsc_tpu.data.dataset import load_directory
    from fpsc_tpu.data.synthetic import synth_waveform
    import numpy as np
    in_dir = tmp_path / "raw"
    in_dir.mkdir()
    x = synth_waveform(np.random.RandomState(2), 16000)
    (x * 32767).astype(np.int16).tofile(str(in_dir / "utt0.s16"))
    n = prepare(str(in_dir), str(tmp_path / "data"), split="train")
    assert n == 1
    items = load_directory(str(tmp_path / "data"), "train")
    assert len(items) == 1
    assert items[0].windows.shape[1:] == (19, 36)
    assert items[0].waveform.shape[0] > 0


def test_qtz_pitch_substitution():
    cfg = Config()
    apply_overrides(cfg, ["data.synthetic=true",
                          "data.synthetic_utterances=2",
                          "data.chunks=2", "data.qtz_pitch=true"])
    ds = build_dataset(cfg.data, "train")
    batch = next(ds.iter_batches(2, seed=0))
    cfg2 = Config()
    apply_overrides(cfg2, ["data.synthetic=true",
                           "data.synthetic_utterances=2",
                           "data.chunks=2"])
    raw = next(build_dataset(cfg2.data, "train").iter_batches(2, seed=0))
    # cepstra untouched, pitch round-tripped through the codes: the
    # recovered integer periods agree with the raw features' periods
    np.testing.assert_array_equal(batch["feat"][..., :18],
                                  raw["feat"][..., :18])
    p_raw = np.floor(0.1 + 50 * raw["feat"][..., 18] + 100)
    p_qtz = np.floor(0.1 + 50 * batch["feat"][..., 18] + 100)
    np.testing.assert_array_equal(np.clip(p_raw, 32, 287), p_qtz)
    assert not np.array_equal(batch["feat"][..., 19], raw["feat"][..., 19])


def test_checkpoint_resume_equivalence(tmp_path):
    """Saving params+opt_state and resuming must continue the exact
    same optimisation trajectory (the reference loses Adam state)."""
    import optax
    from fpsc_tpu.models import frame_predictor as fp
    from fpsc_tpu.train import checkpoint as ckpt

    cfg = fp.FramePredictorConfig(gru_units1=12, gru_units2=8)
    params = fp.init_frame_predictor(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    rng = np.random.RandomState(0)
    feat = jnp.asarray((rng.randn(2, 6, 20) * 0.3).astype(np.float32))

    def loss_fn(p):
        out, _, _ = fp.forward(p, feat)
        return jnp.mean(jnp.square(out[:, :-1] - feat[:, 1:, :18]))

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    # two steps straight through
    p1, s1, _ = step(params, opt_state)
    p2_direct, _, l_direct = step(p1, s1)

    # save after step 1, reload, continue
    path = str(tmp_path / "ck.ckpt")
    ckpt.save(path, p1, s1, step=1)
    payload = ckpt.load(path)
    p1r = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(p1),
        [jnp.asarray(x) for x in jax.tree_util.tree_leaves(
            payload["params"])])
    s1r = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(s1),
        [jnp.asarray(x) if hasattr(x, "shape") else x
         for x in jax.tree_util.tree_leaves(payload["opt_state"])])
    p2_resumed, _, l_resumed = step(p1r, s1r)
    assert payload["step"] == 1
    assert float(l_direct) == pytest.approx(float(l_resumed), abs=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(p2_direct),
                    jax.tree_util.tree_leaves(p2_resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_process_sharded_batches_partition_global_batch():
    """Multi-host input: per-host slices of each global batch must
    partition the single-host batch's utterance selection, step for
    step (the shuffle order comes from the shared seed)."""
    cfg = Config()
    apply_overrides(cfg, ["data.synthetic=true",
                          "data.synthetic_utterances=8",
                          "data.chunks=2"])
    single = build_dataset(cfg.data, "train")
    from fpsc_tpu.data.dataset import Dataset
    hosts = [Dataset(single.items, single.chunks, "train",
                     process_index=i, process_count=2)
             for i in range(2)]
    g_iter = single.iter_batches(4, seed=3)
    h_iters = [h.iter_batches(4, seed=3) for h in hosts]
    for _ in range(2):
        g = next(g_iter)
        parts = [next(it) for it in h_iters]
        assert parts[0]["x"].shape == (2, 2 * 2400)
        assert g["name"] == parts[0]["name"] + parts[1]["name"]
        # different hosts carry different utterances
        assert not set(parts[0]["name"]) & set(parts[1]["name"])
