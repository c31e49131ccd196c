"""LPCNet vocoder tests: teacher-forced training, AR scan parity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpsc_tpu.dsp import constants as C
from fpsc_tpu.dsp.mulaw import l2u_index, u2l
from fpsc_tpu.models import lpcnet
from fpsc_tpu.models.gru import gru_step

RNG = np.random.RandomState(31)

CFG = lpcnet.LPCNetConfig(gru_a_units=48, gru_b_units=8, embed_dim=16,
                          cond_units=24)


@pytest.fixture(scope="module")
def model():
    return lpcnet.init_lpcnet(jax.random.PRNGKey(0), CFG)


def _fake_batch(b=2, frames=3):
    t = frames * C.FRAME_SIZE
    feat = (RNG.randn(b, frames, 20) * 0.3).astype(np.float32)
    periods = RNG.randint(32, 256, (b, frames)).astype(np.int32)
    x = (RNG.randn(b, t) * 0.1).astype(np.float32)
    lpc = (RNG.randn(b, frames, 16) * 0.05).astype(np.float32)
    return feat, periods, x, lpc


def test_forward_shapes_and_loss(model):
    feat, periods, x, lpc = _fake_batch()
    loss = lpcnet.loss_fn(model, jnp.asarray(feat), jnp.asarray(periods),
                          jnp.asarray(x), jnp.asarray(lpc))
    assert np.isfinite(float(loss))
    # untrained CE should be near log(256)
    assert abs(float(loss) - np.log(256)) < 1.5


def test_training_reduces_loss(model):
    import optax
    feat, periods, x, lpc = _fake_batch()
    args = tuple(jnp.asarray(a) for a in (feat, periods, x, lpc))
    tx = optax.adam(1e-3)
    params = model
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(lpcnet.loss_fn)(p, *args)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    losses = []
    for _ in range(30):
        params, opt_state, l = step(params, opt_state)
        losses.append(float(l))
    assert losses[-1] < losses[0] - 0.3


def test_generate_scan_matches_python_loop(model):
    """The fused sampling scan must equal a step-by-step Python loop
    (same PRNG stream): validates carries, LPC history indexing,
    embeddings, and de-emphasis."""
    feat, periods, x, lpc = _fake_batch(b=2, frames=2)
    key = jax.random.PRNGKey(7)
    got = np.asarray(lpcnet.generate(
        model, jnp.asarray(feat), jnp.asarray(periods), jnp.asarray(lpc),
        key))

    # python re-implementation
    b = 2
    t_total = 2 * C.FRAME_SIZE
    cond = np.asarray(lpcnet.frame_net(model, jnp.asarray(feat),
                                       jnp.asarray(periods)))
    cond_up = np.repeat(cond, C.FRAME_SIZE, axis=1)
    lpc_up = np.repeat(lpc, C.FRAME_SIZE, axis=1)
    # generate()'s default corr: un-normalise by MAXI, clip to the
    # physical correlation range
    corr_up = np.repeat(np.clip(feat[..., 19] * C.MAXI, -0.5, 0.5),
                        C.FRAME_SIZE, axis=1)
    uniforms = np.asarray(jax.random.uniform(
        key, (2, b, C.FRAME_SIZE))).transpose(0, 2, 1).reshape(
        t_total, b, 1)

    h_a = jnp.zeros((b, CFG.gru_a_units))
    h_b = jnp.zeros((b, CFG.gru_b_units))
    hist = np.zeros((b, 16), np.float32)
    prev_e = np.zeros(b, np.float32)
    prev_y = np.zeros(b, np.float32)
    emb = np.asarray(model.sample_emb.table)
    out = np.zeros((b, t_total), np.float32)
    for t in range(t_total):
        pred = -np.sum(hist * lpc_up[:, t, ::-1], axis=-1)
        e_x = emb[np.asarray(l2u_index(jnp.asarray(
            hist[:, -1] * 32768.0)))]
        e_e = emb[np.asarray(l2u_index(jnp.asarray(prev_e * 32768.0)))]
        e_p = emb[np.asarray(l2u_index(jnp.asarray(pred * 32768.0)))]
        inp = jnp.asarray(
            np.concatenate([e_x, e_e, e_p, cond_up[:, t]], -1))
        h_a = gru_step(model.gru_a, h_a, inp)
        h_b = gru_step(model.gru_b, h_b,
                       jnp.concatenate([h_a, cond_up[:, t]], -1))
        logits = np.asarray(lpcnet._logits(model, h_b))
        gamma = np.maximum(0.0, 1.5 * corr_up[:, t] - 0.5)[:, None]
        p = np.asarray(jax.nn.softmax(
            jnp.asarray(logits * (1.0 + gamma)), -1))
        p = np.maximum(p - 0.002, 0.0)
        cdf = np.cumsum(p, -1)
        thresh = uniforms[t] * cdf[:, -1:]
        e_idx = (cdf < thresh).sum(-1)
        e_lin = np.asarray(u2l(jnp.asarray(e_idx))) / 32768.0
        sample = pred + e_lin
        hist = np.concatenate([hist[:, 1:], sample[:, None]], 1)
        y = sample + 0.85 * prev_y
        out[:, t] = y
        prev_e = e_lin.astype(np.float32)
        prev_y = y.astype(np.float32)
    np.testing.assert_allclose(got, out, rtol=1e-4, atol=1e-5)


def test_teacher_streams_no_target_leakage():
    """Regression (round-1 advisor high): the pred input at step t must
    be the prediction of x[t] from PAST samples only — the unrolled
    lpc_pred output leaked a1*x[t] into the input whose target is
    exc[t].  Perturbing x[t0:] must leave (exc, pred_t)[:t0] AND
    pred_t[t0] itself unchanged; and x == pred_t + exc identically."""
    import jax.numpy as jnp
    feat, periods, x, lpc = _fake_batch(b=1, frames=2)
    exc, pred_t = lpcnet.teacher_streams(jnp.asarray(x), jnp.asarray(lpc))
    np.testing.assert_allclose(np.asarray(pred_t) + np.asarray(exc), x,
                               rtol=1e-5, atol=1e-7)
    t0 = 100
    x2 = x.copy()
    x2[:, t0:] += 0.5
    exc2, pred_t2 = lpcnet.teacher_streams(jnp.asarray(x2),
                                           jnp.asarray(lpc))
    np.testing.assert_array_equal(np.asarray(pred_t)[:, :t0 + 1],
                                  np.asarray(pred_t2)[:, :t0 + 1])
    np.testing.assert_array_equal(np.asarray(exc)[:, :t0],
                                  np.asarray(exc2)[:, :t0])


def test_generate_output_sane(model):
    feat, periods, x, lpc = _fake_batch(b=3, frames=2)
    y = np.asarray(lpcnet.generate(
        model, jnp.asarray(feat), jnp.asarray(periods), jnp.asarray(lpc),
        jax.random.PRNGKey(0)))
    assert y.shape == (3, 2 * C.FRAME_SIZE)
    assert np.isfinite(y).all()


def test_shape_probs_properties():
    probs = jax.nn.softmax(jnp.asarray(RNG.randn(4, 256)), -1)
    shaped = lpcnet.shape_probs(probs, jnp.asarray([0.0, 0.3, 0.6, 1.0]))
    s = np.asarray(shaped)
    np.testing.assert_allclose(s.sum(-1), 1.0, rtol=1e-5)
    # high correlation sharpens the distribution (lower entropy)
    def ent(p):
        return float(-(p * np.log(p + 1e-12)).sum())
    assert ent(s[3]) < ent(s[0])


def test_train_lpcnet_entry(tmp_path):
    from fpsc_tpu.config.config import Config, apply_overrides
    from fpsc_tpu.train import train_lpcnet as tl
    cfg = Config()
    apply_overrides(cfg, [
        "data.synthetic=true", "data.synthetic_utterances=2",
        "data.chunks=1", "data.batch_size=2",
        "lpcnet.gru_a_units=32", "lpcnet.gru_b_units=8",
        "lpcnet.embed_dim=16", "lpcnet.cond_units=16",
        "train.epochs=1", "train.debugging=true",
        f"train.save_dir={tmp_path}",
    ])
    params, loss = tl.run(cfg)
    assert np.isfinite(loss)


def test_train_lpcnet_noise_ramp_schedule(tmp_path):
    """noise_warmup_frac trains the first epochs clean, then switches
    to the noisy step (both phases must run and stay finite)."""
    from fpsc_tpu.config.config import Config, apply_overrides
    from fpsc_tpu.train import train_lpcnet as tl
    cfg = Config()
    apply_overrides(cfg, [
        "data.synthetic=true", "data.synthetic_utterances=2",
        "data.chunks=1", "data.batch_size=2",
        "lpcnet.gru_a_units=32", "lpcnet.gru_b_units=8",
        "lpcnet.embed_dim=16", "lpcnet.cond_units=16",
        "lpcnet.noise_levels=2", "lpcnet.noise_warmup_frac=0.5",
        "train.epochs=4", "train.steps_per_epoch=1",
        f"train.save_dir={tmp_path}", "train.save_every=1000",
    ])
    params, loss = tl.run(cfg)
    assert np.isfinite(loss)


def test_upd_f_only_freezes_sample_net(tmp_path):
    """With upd_f_only the sample-rate net must not move."""
    import optax
    from fpsc_tpu.config.config import Config, apply_overrides
    from fpsc_tpu.train import train_lpcnet as tl
    cfg = Config()
    apply_overrides(cfg, ["train.upd_f_only=true"])
    params = lpcnet.init_lpcnet(jax.random.PRNGKey(0), CFG)
    tx = tl.build_optimizer(cfg, params)
    opt_state = tx.init(params)
    feat, periods, x, lpc = _fake_batch()
    loss, grads = jax.value_and_grad(lpcnet.loss_fn)(
        params, jnp.asarray(feat), jnp.asarray(periods), jnp.asarray(x),
        jnp.asarray(lpc))
    updates, _ = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    # frozen: gru_a unchanged; trained: conv1 changed
    np.testing.assert_array_equal(np.asarray(new_params.gru_a.wi),
                                  np.asarray(params.gru_a.wi))
    assert not np.array_equal(np.asarray(new_params.conv1),
                              np.asarray(params.conv1))


def test_gru_a_sparsification():
    """Magnitude block pruning reaches the target density, keeps the
    diagonal blocks, and the schedule ramps correctly."""
    params = lpcnet.init_lpcnet(jax.random.PRNGKey(2), CFG)  # Ha=48
    block = (16, 16)
    density = 0.4
    sp = lpcnet.sparsify_gru_a(params, density, block=block)
    wh = np.asarray(sp.gru_a.wh)          # (144, 48)
    blocks = wh.reshape(144 // 16, 16, 48 // 16, 16)
    live = (np.abs(blocks).sum((1, 3)) > 0)
    got_density = live.mean()
    assert abs(got_density - density) < 0.15, got_density
    # diagonal blocks of each gate survive
    gate_rows = live.shape[0] // 3
    for g in range(3):
        for r in range(gate_rows):
            col = (r * 16) // 16
            assert live[g * gate_rows + r, col]
    # schedule: dense before start, final after end, monotone between
    s = lpcnet.sparsity_schedule
    assert s(0, 100, 1000, 0.1) == 1.0
    assert s(2000, 100, 1000, 0.1) == 0.1
    mid = [s(t, 100, 1000, 0.1) for t in (200, 500, 900)]
    assert mid[0] > mid[1] > mid[2]


def test_train_lpcnet_sparsify_path(tmp_path):
    from fpsc_tpu.config.config import Config, apply_overrides
    from fpsc_tpu.train import train_lpcnet as tl
    cfg = Config()
    apply_overrides(cfg, [
        "data.synthetic=true", "data.synthetic_utterances=2",
        "data.chunks=1", "data.batch_size=2",
        "lpcnet.gru_a_units=32", "lpcnet.gru_b_units=8",
        "lpcnet.embed_dim=16", "lpcnet.cond_units=16",
        "lpcnet.gru_a_density=0.5", "lpcnet.sparsify_start=0",
        "lpcnet.sparsify_end=1",
        "train.epochs=2", f"train.save_dir={tmp_path}",
        "train.save_every=10",
    ])
    params, loss = tl.run(cfg)
    assert np.isfinite(loss)
    wh = np.asarray(params.gru_a.wh)
    # (96, 32) with (16, 32)-clamped blocks -> some blocks zeroed
    zero_frac = float((wh == 0).mean())
    assert zero_frac > 0.2, zero_frac


def test_noisy_streams_consistency():
    """noisy_streams invariants: the input excitation is self-
    consistent with the noisy signal path (exc_in = x_n - pred(x_n)
    rolled), the target steers back to the CLEAN sample
    (exc_tgt + pred_t == x), and noise_levels=0 reduces to the
    teacher streams exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fpsc_tpu.dsp.lpc import lpc_pred
    from fpsc_tpu.models import lpcnet

    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.randn(3, 320) * 0.1).astype(np.float32))
    lpc = jnp.asarray((rng.randn(3, 2, 16) * 0.05).astype(np.float32))
    key = jax.random.PRNGKey(4)
    x_n, exc_in, pred_t, exc_tgt = lpcnet.noisy_streams(x, lpc, key, 2)
    pred = lpc_pred(x_n, lpc)
    want_pred_t = jnp.roll(pred, 1, axis=-1).at[:, 0].set(0.0)
    np.testing.assert_allclose(np.asarray(pred_t),
                               np.asarray(want_pred_t), atol=1e-6)
    np.testing.assert_allclose(np.asarray(exc_in),
                               np.asarray(x_n - pred_t), atol=1e-6)
    np.testing.assert_allclose(np.asarray(exc_tgt + pred_t),
                               np.asarray(x), atol=1e-6)
    # the noisy signal stays within +-2 mu-law codes of the original
    from fpsc_tpu.dsp.mulaw import l2u_index
    du = np.abs(np.asarray(l2u_index(x_n * 32768.0))
                - np.asarray(l2u_index(x * 32768.0)))
    assert du.max() <= 3        # rounding can add 1 to the 2-code cap
    # levels=0 reduces to the teacher streams up to the mu-law
    # ROUNDING of the signal path (noisy_streams always quantises the
    # history to the 8-bit lattice generation actually carries)
    x_0, exc_in0, pred_t0, exc_tgt0 = lpcnet.noisy_streams(
        x, lpc, key, 0)
    du0 = np.abs(np.asarray(l2u_index(x_0 * 32768.0))
                 - np.asarray(l2u_index(x * 32768.0)))
    assert du0.max() == 0
    exc_ref, pred_ref = lpcnet.teacher_streams(x, lpc)
    np.testing.assert_allclose(np.asarray(exc_tgt0),
                               np.asarray(exc_ref), atol=0.02)
    np.testing.assert_allclose(np.asarray(pred_t0),
                               np.asarray(pred_ref), atol=0.02)


def test_chunked_loss_matches_unchunked(model):
    """lpcnet.loss_fn(time_chunks=n) — the rematerialised segment scan
    that unlocks batch >= 64 past the 2 GiB activation boundary — must
    compute the IDENTICAL loss and gradients as the one-shot forward
    (GRU states thread between segments; prev-sample rolls cross the
    boundaries)."""
    import jax
    import jax.numpy as jnp
    params = model
    feat, periods, x, lpc = _fake_batch(b=2, frames=4)
    args = (jnp.asarray(feat), jnp.asarray(periods), jnp.asarray(x),
            jnp.asarray(lpc))

    for kw in ({}, {"noise_key": jax.random.PRNGKey(3),
                    "noise_levels": 2}):
        l0, g0 = jax.value_and_grad(lpcnet.loss_fn)(params, *args, **kw)
        l4, g4 = jax.value_and_grad(lpcnet.loss_fn)(
            params, *args, time_chunks=4, **kw)
        np.testing.assert_allclose(float(l4), float(l0),
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g4)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-6)


def test_make_step_time_chunks(tmp_path):
    """make_step(time_chunks=...) trains with the chunked loss."""
    import jax
    import optax
    params = lpcnet.init_lpcnet(jax.random.PRNGKey(0), CFG)
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    from fpsc_tpu.train.train_lpcnet import make_step
    step, ev = make_step(tx, noise_levels=2, time_chunks=4)
    r = np.random.RandomState(0)
    import jax.numpy as jnp
    feat = jnp.asarray(r.randn(2, 4, 20).astype(np.float32) * .3)
    periods = jnp.asarray(r.randint(32, 256, (2, 4)).astype(np.int32))
    x = jnp.asarray(r.randn(2, 640).astype(np.float32) * .1)
    lpc = jnp.asarray(r.randn(2, 4, 16).astype(np.float32) * .05)
    losses = []
    for i in range(8):
        params, opt, loss = step(params, opt, feat, periods, x, lpc,
                                 jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]

def test_auto_time_chunks_anchors():
    """auto_time_chunks reproduces the measured compile-boundary
    anchors from scripts/bench_train_scaling.py (VALIDATION.md
    round 5): one-shot below 2.13 GB, the recorded divisors above."""
    from fpsc_tpu.train.train_lpcnet import auto_time_chunks
    # flagship geometry: chunks=6 (90 frames), GRU_A 384
    # unbunched: B32 one-shot (2.12 GB), B64->tc2, B128->tc5, B512->tc18
    assert auto_time_chunks(16, 6, 1, 384) == 0
    assert auto_time_chunks(32, 6, 1, 384) == 0
    assert auto_time_chunks(64, 6, 1, 384) == 2
    assert auto_time_chunks(128, 6, 1, 384) == 5
    assert auto_time_chunks(512, 6, 1, 384) == 18
    # bunch=2 halves the scan: B64 one-shot, B128->tc2, B256->tc5,
    # B512->tc9 (the production curve)
    assert auto_time_chunks(64, 6, 2, 384) == 0
    assert auto_time_chunks(96, 6, 2, 384) == 2
    assert auto_time_chunks(128, 6, 2, 384) == 2
    assert auto_time_chunks(256, 6, 2, 384) == 5
    assert auto_time_chunks(512, 6, 2, 384) == 9
    # result always divides the frame count (scan segment contract)
    for b in (48, 96, 160, 384, 1024):
        tc = auto_time_chunks(b, 6, 2, 384)
        assert tc == 0 or 90 % tc == 0
