"""Multi-device (virtual 8-CPU mesh) sharding tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpsc_tpu.parallel import mesh as meshlib


def test_mesh_uses_all_devices():
    m = meshlib.make_mesh()
    assert m.shape["data"] * m.shape["model"] == len(jax.devices())


def test_shard_batch_divisible_and_not():
    m = meshlib.make_mesh()
    batch = {"a": np.zeros((16, 3), np.float32),
             "b": np.zeros((3, 5), np.float32)}
    out = meshlib.shard_batch(m, batch)
    assert not out["a"].sharding.is_fully_replicated
    assert out["b"].sharding.is_fully_replicated


def test_dp_training_step_matches_single_device():
    """A data-parallel frame-predictor step must produce the same loss
    and (replicated) updated params as the unsharded computation."""
    import optax
    from fpsc_tpu.models import frame_predictor as fp

    cfg = fp.FramePredictorConfig(gru_units1=16, gru_units2=8)
    params = fp.init_frame_predictor(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    feat = (rng.randn(16, 12, 20) * 0.3).astype(np.float32)
    tx = optax.sgd(0.1)
    opt_state = tx.init(params)

    def loss_fn(p, f):
        out, _, _ = fp.forward(p, f)
        return jnp.mean(jnp.square(out[:, :-1] - f[:, 1:, :18]))

    @jax.jit
    def step(p, s, f):
        l, g = jax.value_and_grad(loss_fn)(p, f)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), l

    # single device
    p1, l1 = step(params, opt_state, jnp.asarray(feat))

    # sharded over the 8-device data axis
    m = meshlib.make_mesh()
    p_rep = meshlib.replicate(m, params)
    f_sh = meshlib.shard_batch(m, feat)
    p2, l2 = step(p_rep, opt_state, f_sh)

    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_dp_tp_vocoder_step_matches_single_device():
    """The 4x2 DPxTP vocoder train step must match the single-device
    computation NUMERICALLY (loss and updated params), not just
    produce a finite loss — pins the TP shardings' correctness."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fpsc_tpu.models import lpcnet

    cfg = lpcnet.LPCNetConfig(gru_a_units=32, gru_b_units=8,
                              embed_dim=16, cond_units=16)
    params = lpcnet.init_lpcnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    batch, frames = 8, 2
    t = frames * 160
    feat = (rng.randn(batch, frames, 20) * 0.3).astype(np.float32)
    periods = rng.randint(32, 256, (batch, frames)).astype(np.int32)
    x = (rng.randn(batch, t) * 0.1).astype(np.float32)
    lpc = (rng.randn(batch, frames, 16) * 0.05).astype(np.float32)

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s, feat, periods, x, lpc):
        loss, grads = jax.value_and_grad(lpcnet.loss_fn)(
            p, feat, periods, x, lpc)
        u, s = tx.update(grads, s, p)
        return optax.apply_updates(p, u), loss

    p1, l1 = step(params, opt_state,
                  jnp.asarray(feat), jnp.asarray(periods),
                  jnp.asarray(x), jnp.asarray(lpc))

    m = meshlib.make_mesh(n_data=4, n_model=2)

    def shard_param(leaf):
        if leaf.ndim == 2 and leaf.shape[0] % 2 == 0:
            return NamedSharding(m, P("model", None))
        if leaf.ndim == 1 and leaf.shape[0] % 2 == 0:
            return NamedSharding(m, P("model"))
        return NamedSharding(m, P())

    p_sh = jax.tree_util.tree_map(
        lambda v: jax.device_put(v, shard_param(v)), params)
    s_sh = tx.init(p_sh)
    data_sh = NamedSharding(m, P("data"))
    args = [jax.device_put(a, data_sh) for a in (feat, periods, x, lpc)]
    with m:
        p2, l2 = step(p_sh, s_sh, *args)

    np.testing.assert_allclose(float(l1), float(l2),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_batch_sharded_generate_matches_single_device():
    """Batch-sharded lpcnet.generate must produce the SAME waveform as
    the unsharded run (sampling is deterministic given the key)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fpsc_tpu.models import lpcnet

    cfg = lpcnet.LPCNetConfig(gru_a_units=32, gru_b_units=8,
                              embed_dim=16, cond_units=16)
    params = lpcnet.init_lpcnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    batch, frames = 8, 2
    feat = (rng.randn(batch, frames, 20) * 0.3).astype(np.float32)
    periods = rng.randint(32, 256, (batch, frames)).astype(np.int32)
    lpc = (rng.randn(batch, frames, 16) * 0.05).astype(np.float32)
    key = jax.random.PRNGKey(7)

    @jax.jit
    def gen(p, f, pr, l):
        return lpcnet.generate(p, f, pr, l, key, unroll=1)

    want = np.asarray(gen(params, jnp.asarray(feat),
                          jnp.asarray(periods), jnp.asarray(lpc)))

    m = meshlib.make_mesh(n_data=8, n_model=1)
    data_sh = NamedSharding(m, P("data"))
    with m:
        got = gen(jax.device_put(params, NamedSharding(m, P())),
                  jax.device_put(feat, data_sh),
                  jax.device_put(periods, data_sh),
                  jax.device_put(lpc, data_sh))
    np.testing.assert_allclose(np.asarray(got), want,
                               rtol=1e-5, atol=1e-5)


def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


def test_sharded_codebook_search():
    """Nearest-entry search with the codebook sharded over 'model':
    XLA inserts the gather/reduce collectives; result matches the
    replicated computation."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fpsc_tpu.quant.lbg import find_nearest

    m = meshlib.make_mesh(n_data=4, n_model=2)
    rng = np.random.RandomState(1)
    data = (rng.randn(64, 17)).astype(np.float32)
    cb = (rng.randn(32, 17)).astype(np.float32)
    want = np.asarray(find_nearest(jnp.asarray(data), jnp.asarray(cb)))

    data_sh = jax.device_put(data, NamedSharding(m, P("data")))
    cb_sh = jax.device_put(cb, NamedSharding(m, P("model")))
    with m:
        got = np.asarray(jax.jit(find_nearest)(data_sh, cb_sh))
    np.testing.assert_array_equal(got, want)


def test_shard_map_find_nearest_matches_gspmd():
    """Hand-written collective search == single-device argmin."""
    from fpsc_tpu.parallel.sharded_vq import (shard_arrays,
                                              sharded_find_nearest)
    from fpsc_tpu.quant.lbg import find_nearest
    m = meshlib.make_mesh(n_data=4, n_model=2)
    rng = np.random.RandomState(3)
    data = rng.randn(64, 17).astype(np.float32)
    cb = rng.randn(32, 17).astype(np.float32)
    want = np.asarray(find_nearest(jnp.asarray(data), jnp.asarray(cb)))
    d_sh, cb_sh = shard_arrays(m, data, cb)
    got = np.asarray(sharded_find_nearest(m, d_sh, cb_sh))
    np.testing.assert_array_equal(got, want)


def test_shard_map_kmeans_update_matches_single():
    from fpsc_tpu.parallel.sharded_vq import (shard_arrays,
                                              sharded_kmeans_update)
    from fpsc_tpu.quant.lbg import kmeans_update
    m = meshlib.make_mesh(n_data=4, n_model=2)
    rng = np.random.RandomState(4)
    data = rng.randn(128, 6).astype(np.float32)
    cb = rng.randn(16, 6).astype(np.float32)
    want_cb, want_counts = kmeans_update(jnp.asarray(data),
                                         jnp.asarray(cb),
                                         jnp.asarray(16))
    d_sh, cb_sh = shard_arrays(m, data, cb)
    got_cb, got_counts = sharded_kmeans_update(m, d_sh, cb_sh)
    np.testing.assert_allclose(np.asarray(got_cb), np.asarray(want_cb),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_counts),
                               np.asarray(want_counts))
