"""Differential parity against the REFERENCE'S OWN code.

Round-1 parity tests ran against tests/oracles.py — a same-author
reimplementation; if the oracle mis-transcribed the reference, every
"bit-exact" claim silently inherited the error.  These tests import
the actual modules from /root/reference/src (pure numpy/torch, runnable
on CPU) and compare:

* quant/vq.py m-best multi-stage search vs vq_func.quantize_mstage /
  vq_quantize           (reference src/quantization/vq_func.py:82-164)
* quant/scalar.py       vs vq_func.scl_quantize      (vq_func.py:167-185)
* quant/lbg.py compat   vs cb_func.vq_train/update   (cb_func.py:28-100)
  with a shared seeded RandomState
* dsp/ceps2lpc.py       vs ceps2lpc_vct.ceps2lpc_v   (ceps2lpc_vct.py:122-161)
* frame_predictor.encoder closed loop vs torch Wavernn.encoder
  (wavernn.py:165-256) with weights exported via utils/torch_import

The reference modules import packages absent here (librosa, sacred,
torchaudio, soundfile) and a sibling `utils`/`config`; a stub loader
injects empty placeholder modules for those — only pure numpy/torch
code paths are exercised.
"""
import importlib.util
import io
import os
import sys
import types
from contextlib import redirect_stdout

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference tree not available")


class _StubModule(types.ModuleType):
    """Import-time placeholder: any attribute resolves to a sub-stub;
    calls act as pass-through decorators (the reference uses
    @ex.capture at module level)."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        sub = _StubModule(f"{self.__name__}.{name}")
        setattr(self, name, sub)
        return sub

    def __call__(self, *args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]
        return _StubModule(f"{self.__name__}()")


_STUB_NAMES = ("librosa", "torchaudio", "soundfile", "sacred",
               "sklearn_stub", "utils", "config", "tqdm_stub")


def _load_reference_module(name: str, relpath: str, real_deps=None):
    """Load a reference module with stubs for its unavailable deps.

    real_deps: optional {import_name: loaded module} injected so
    reference modules can import their siblings (e.g. wavenet.py's
    `from modules import Conv, ResBlock`)."""
    saved = {}
    for s in _STUB_NAMES:
        saved[s] = sys.modules.get(s)
        stub = _StubModule(s)
        if s == "config":
            stub.ex = _StubModule("config.ex")
        sys.modules[s] = stub
    for dep, mod in (real_deps or {}).items():
        saved[dep] = sys.modules.get(dep)
        sys.modules[dep] = mod
    try:
        spec = importlib.util.spec_from_file_location(
            f"refparity_{name}", os.path.join(REF_SRC, relpath))
        mod = importlib.util.module_from_spec(spec)
        with redirect_stdout(io.StringIO()):
            spec.loader.exec_module(mod)
        return mod
    finally:
        for s, old in saved.items():
            if old is None:
                sys.modules.pop(s, None)
            else:
                sys.modules[s] = old


@pytest.fixture(scope="module")
def ref_vq():
    return _load_reference_module("vq_func", "quantization/vq_func.py")


@pytest.fixture(scope="module")
def ref_cb():
    return _load_reference_module("cb_func", "quantization/cb_func.py")


@pytest.fixture(scope="module")
def ref_ceps():
    return _load_reference_module("ceps2lpc_vct", "ceps2lpc/ceps2lpc_vct.py")


# ---------------------------------------------------------------------------
# m-best multi-stage VQ
# ---------------------------------------------------------------------------

def _random_books(rng, sizes, dim=17, scale=0.3):
    return [rng.randn(e, dim).astype(np.float32) * scale for e in sizes]


@pytest.mark.parametrize("sizes,n_vec", [
    ([64, 32], 2000),              # many vectors, small books
    ([512], 1000),                 # below-threshold geometry, 1 stage
    ([1024, 1024], 300),           # production geometry (ref README:26-29)
])
def test_mbest_indices_match_reference_quantize_mstage(ref_vq, sizes,
                                                       n_vec):
    """Our batched top-k beam == the reference's survivor-insertion
    beam, index-for-index, on the reference's own code.

    NOTE: the reference's quantize_mstage itself CRASHES for >= 3
    stages (vq_func.py:111 broadcasts last_idx[:st,k] of shape (st,)
    into index[:st] of shape (st, SURVIVORS), which numpy rejects for
    st >= 2); it only ever ran 1- and 2-stage books in production, so
    those are the geometries pinned here (documented in PARITY.md)."""
    from fpsc_tpu.quant.vq import vq_quantize

    rng = np.random.RandomState(123)
    books = _random_books(rng, sizes)
    x = rng.randn(n_vec, 17).astype(np.float32) * 0.5

    qr, idx, _ = vq_quantize(jnp.asarray(x),
                             [jnp.asarray(b) for b in books])
    qr, idx = np.asarray(qr), np.asarray(idx)

    n_entries = np.array(sizes)
    ref_books = np.empty(len(books), dtype=object)
    for i, b in enumerate(books):
        ref_books[i] = b
    for v in range(n_vec):
        want_q, want_idx = ref_vq.quantize_mstage(x[v], n_entries,
                                                  ref_books)
        np.testing.assert_array_equal(
            idx[v], want_idx,
            err_msg=f"vector {v}: index stream diverges from reference")
        np.testing.assert_allclose(qr[v], want_q, rtol=1e-6, atol=1e-7)


def test_vq_quantize_usage_counts_match_reference(ref_vq, tmp_path):
    """Full vq_quantize wrapper (quantised vectors + per-entry usage
    histograms) vs reference vq_func.vq_quantize via its .npy path."""
    from fpsc_tpu.quant.vq import vq_quantize

    rng = np.random.RandomState(7)
    books = _random_books(rng, [32, 16])
    x = rng.randn(500, 17).astype(np.float32) * 0.5

    cb = np.empty(2, dtype=object)
    cb[0], cb[1] = books
    path = str(tmp_path / "cb.npy")
    np.save(path, cb, allow_pickle=True)

    want_qr, want_counts = ref_vq.vq_quantize(x, path)
    qr, idx, counts = vq_quantize(jnp.asarray(x),
                                  [jnp.asarray(b) for b in books])
    np.testing.assert_allclose(np.asarray(qr), want_qr,
                               rtol=1e-6, atol=1e-7)
    for s in range(2):
        np.testing.assert_array_equal(
            np.asarray(counts[s]), want_counts[s].astype(np.int64))


def test_scl_quantize_matches_reference(ref_vq, tmp_path):
    from fpsc_tpu.quant.scalar import scl_quantize

    rng = np.random.RandomState(11)
    codes = np.sort(rng.randn(256).astype(np.float32)) * 0.2
    data = rng.randn(4000).astype(np.float32) * 0.3

    path = str(tmp_path / "scl.npy")
    np.save(path, codes[:, None])    # reference stores (n_code, 1)
    want_q, want_counts = ref_vq.scl_quantize(data[:, None], path)

    q, idx, counts = scl_quantize(jnp.asarray(data), jnp.asarray(codes))
    np.testing.assert_array_equal(np.asarray(q), want_q[:, 0])
    np.testing.assert_array_equal(np.asarray(counts), want_counts)


# ---------------------------------------------------------------------------
# LBG codebook training
# ---------------------------------------------------------------------------

def test_lbg_vq_train_matches_reference_bit_for_bit(ref_cb):
    """compat-mode vq_train vs cb_func.vq_train with the SAME seeded
    random stream (np.random.seed(S) == RandomState(S) draw-for-draw).
    The compat path mirrors the reference's float64 numpy arithmetic
    exactly, so the codebooks are BIT-EQUAL at f32 output precision."""
    from fpsc_tpu.quant.lbg import vq_train

    rng_data = np.random.RandomState(42)
    data = rng_data.randn(600, 17).astype(np.float32) * 0.4
    nb = 16

    np.random.seed(99)
    with redirect_stdout(io.StringIO()):
        want = ref_cb.vq_train(data, np.zeros((nb, 17)), nb)

    got = np.asarray(vq_train(data, nb, rng=np.random.RandomState(99)))
    np.testing.assert_array_equal(got, want.astype(np.float32))


def test_kmeans_update_matches_reference(ref_cb):
    """One update() step: mass re-assignment + centroid mean with the
    count+1e-20 empty-cell semantics (cb_func.py:71-100)."""
    from fpsc_tpu.quant.lbg import kmeans_update

    rng = np.random.RandomState(3)
    data = rng.randn(400, 17).astype(np.float32) * 0.5
    cb = rng.randn(8, 17).astype(np.float32) * 0.5

    with redirect_stdout(io.StringIO()):
        want = ref_cb.update(data.astype(np.float64),
                             cb.astype(np.float64), 8)
    got, _ = kmeans_update(jnp.asarray(data), jnp.asarray(cb),
                           jnp.asarray(8))
    np.testing.assert_allclose(np.asarray(got), want,
                               rtol=1e-5, atol=1e-6)


def test_multistage_chain_matches_reference(ref_cb):
    """Stage chaining r <- quantize(cb, r) - r (train_cb.py:193-201):
    train two chained stages both ways from one random stream."""
    from fpsc_tpu.quant import lbg

    data = np.random.RandomState(8).randn(500, 17).astype(np.float32)

    np.random.seed(5)
    with redirect_stdout(io.StringIO()):
        cb0 = ref_cb.vq_train(data, np.zeros((8, 17)), 8)
        r = ref_cb.quantize(cb0, data) - data
        cb1 = ref_cb.vq_train(r, np.zeros((4, 17)), 4)

    books = lbg.train_multistage(data, [8, 4],
                                 rng=np.random.RandomState(5))
    np.testing.assert_array_equal(np.asarray(books[0]),
                                  cb0.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(books[1]),
                                  cb1.astype(np.float32))


# ---------------------------------------------------------------------------
# ceps2lpc DSP chain
# ---------------------------------------------------------------------------

def test_ceps2lpc_matches_reference(ref_ceps):
    """Batched XLA idct->interp->irfft->Levinson vs the reference's
    torch chain with its per-row scalar Levinson loop."""
    import torch

    from fpsc_tpu.dsp.ceps2lpc import ceps2lpc

    rng = np.random.RandomState(21)
    # realistic cepstrum magnitudes (post 10**x the dynamic range is
    # large; keep c0 moderate as real data does)
    cep = (rng.randn(64, 18) * 0.5).astype(np.float32)
    cep[:, 0] = rng.uniform(-2.0, 1.0, 64)

    with torch.no_grad():
        want_e, want_lpc, want_rc = ref_ceps.ceps2lpc_v(
            torch.tensor(cep, dtype=torch.float32))
    got_e, got_lpc, got_rc = ceps2lpc(jnp.asarray(cep))

    np.testing.assert_allclose(np.asarray(got_lpc), want_lpc.numpy(),
                               rtol=1e-3, atol=2e-4)
    # the reference's returned `e` is a scalar: its per-row loop
    # overwrites e, so only the LAST row's prediction error survives
    # (ceps2lpc_vct.py:153-157); ours returns the full (N,) vector.
    np.testing.assert_allclose(float(np.asarray(got_e)[-1]),
                               float(want_e), rtol=1e-3)


# ---------------------------------------------------------------------------
# Closed-loop encoder vs torch Wavernn.encoder
# ---------------------------------------------------------------------------

def test_closed_loop_encoder_matches_reference_wavernn(tmp_path):
    """The reference torch Wavernn.encoder (threshold + real
    quantisers, wavernn.py:165-256) and frame_predictor.encoder produce
    the same coded frames / quantised residuals / indicator streams
    when the torch weights are imported via utils/torch_import.

    Pitch convention: the reference encoder conditions frame t on the
    pitch of t-1 (c_in[:,1:,-2:] = feat[:,:,-2:]); ours uses the
    current frame's pitch (documented deviation, PARITY.md).  The
    reference is therefore fed a one-frame-advanced pitch track so both
    loops see identical inputs."""
    import torch

    from fpsc_tpu.models import frame_predictor as fp
    from fpsc_tpu.utils.torch_import import wavernn_to_frame_predictor

    ref_wavernn = _load_reference_module("wavernn", "models/wavernn.py")
    ref_wavernn.device = "cpu"          # module-global 'cuda' override
    ref_vq_mod = _load_reference_module("vq_func",
                                        "quantization/vq_func.py")

    torch.manual_seed(0)
    model = ref_wavernn.Wavernn(in_features=20, gru_units1=24,
                                gru_units2=12, fc_units=18)
    model.eval()
    params, _cfg = wavernn_to_frame_predictor(model.state_dict())

    rng = np.random.RandomState(17)
    books = {
        "scl": np.sort(rng.randn(16).astype(np.float32)) * 0.1,
        "scl_bl": np.sort(rng.randn(8).astype(np.float32)) * 0.02,
        "vq": _random_books(rng, [32, 16], scale=0.1),
        "vq_bl": _random_books(rng, [16], scale=0.02),
    }
    paths = {}
    for name in ("scl", "scl_bl"):
        paths[name] = str(tmp_path / f"{name}.npy")
        np.save(paths[name], books[name][:, None])
    for name in ("vq", "vq_bl"):
        arr = np.empty(len(books[name]), dtype=object)
        for i, b in enumerate(books[name]):
            arr[i] = b
        paths[name] = str(tmp_path / f"{name}.npy")
        np.save(paths[name], arr, allow_pickle=True)
    cfg = {"scl_cb_path": paths["scl"], "bl_scl_cb_path": paths["scl_bl"],
           "cb_path": paths["vq"], "bl_cb_path": paths["vq_bl"]}

    feat = (rng.randn(1, 20, 20) * 0.3).astype(np.float32)
    # the reference's step-0 input carries ZERO pitch (c_in[:,0,-2:]
    # is never filled); zero ours too so both loops see identical
    # per-step inputs
    feat[:, 0, 18:] = 0.0
    l1, l2 = 0.09, 0.28

    # reference: advance the pitch track one frame so its shifted
    # convention sees the same per-step pitch as ours
    feat_ref = feat.copy()
    feat_ref[:, :-1, 18:] = feat[:, 1:, 18:]
    feat_ref[:, -1, 18:] = 0.0           # unused by the reference loop
    with torch.no_grad():
        c_in, r, r_qtz, r_under, ind1_m, ind2_m, _ = model.encoder(
            cfg, torch.tensor(feat_ref), None, l1, l2,
            vq_quantize=ref_vq_mod.vq_quantize,
            scl_quantize=ref_vq_mod.scl_quantize, qtz=True)

    cbs = fp.Codebooks(
        scl=jnp.asarray(books["scl"]),
        vq=tuple(jnp.asarray(b) for b in books["vq"]),
        scl_bl=jnp.asarray(books["scl_bl"]),
        vq_bl=tuple(jnp.asarray(b) for b in books["vq_bl"]),
    )
    out = fp.encoder(params, jnp.asarray(feat), l1=l1, l2=l2,
                     codebooks=cbs, qtz=True)

    np.testing.assert_array_equal(
        np.asarray(out["ind1"]).astype(int)[0],
        ind1_m.numpy()[0, :, 0].astype(int))
    np.testing.assert_array_equal(
        np.asarray(out["ind2"]).astype(int)[0],
        ind2_m.numpy()[0, :, 0].astype(int))
    np.testing.assert_allclose(np.asarray(out["r_qtz"])[0],
                               r_qtz.numpy()[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["c_in"])[0, :, :18],
                               c_in.numpy()[0, :, :18],
                               rtol=1e-4, atol=1e-5)


def test_pitch_lag_compat_mode_matches_reference_unmodified(tmp_path):
    """pitch_lag=1 reproduces the reference encoder's NATIVE pitch
    convention (frame t conditioned on pitch t-1, zero at step 0 —
    wavernn.py:177-180) with NO doctoring of either side's inputs: an
    imported .pth runs in-distribution without retraining.  The
    compat-mode decoder inverts the compat-mode encoder."""
    import torch

    from fpsc_tpu.codec.codec import decode, encode
    from fpsc_tpu.models import frame_predictor as fp
    from fpsc_tpu.utils.torch_import import wavernn_to_frame_predictor

    ref_wavernn = _load_reference_module("wavernn", "models/wavernn.py")
    ref_wavernn.device = "cpu"
    ref_vq_mod = _load_reference_module("vq_func",
                                        "quantization/vq_func.py")

    torch.manual_seed(3)
    model = ref_wavernn.Wavernn(in_features=20, gru_units1=24,
                                gru_units2=12, fc_units=18)
    model.eval()
    params, _cfg = wavernn_to_frame_predictor(model.state_dict())

    rng = np.random.RandomState(23)
    books = {
        "scl": np.sort(rng.randn(16).astype(np.float32)) * 0.1,
        "scl_bl": np.sort(rng.randn(8).astype(np.float32)) * 0.02,
        "vq": _random_books(rng, [32, 16], scale=0.1),
        "vq_bl": _random_books(rng, [16], scale=0.02),
    }
    paths = {}
    for name in ("scl", "scl_bl"):
        paths[name] = str(tmp_path / f"{name}.npy")
        np.save(paths[name], books[name][:, None])
    for name in ("vq", "vq_bl"):
        arr = np.empty(len(books[name]), dtype=object)
        for i, b in enumerate(books[name]):
            arr[i] = b
        paths[name] = str(tmp_path / f"{name}.npy")
        np.save(paths[name], arr, allow_pickle=True)
    cfg = {"scl_cb_path": paths["scl"], "bl_scl_cb_path": paths["scl_bl"],
           "cb_path": paths["vq"], "bl_cb_path": paths["vq_bl"]}

    # a NATURAL track: pitch everywhere, nothing zeroed or shifted
    feat = (rng.randn(1, 20, 20) * 0.3).astype(np.float32)
    l1, l2 = 0.09, 0.28
    with torch.no_grad():
        c_in, r, r_qtz, r_under, ind1_m, ind2_m, _ = model.encoder(
            cfg, torch.tensor(feat), None, l1, l2,
            vq_quantize=ref_vq_mod.vq_quantize,
            scl_quantize=ref_vq_mod.scl_quantize, qtz=True)

    cbs = fp.Codebooks(
        scl=jnp.asarray(books["scl"]),
        vq=tuple(jnp.asarray(b) for b in books["vq"]),
        scl_bl=jnp.asarray(books["scl_bl"]),
        vq_bl=tuple(jnp.asarray(b) for b in books["vq_bl"]),
    )
    enc = encode(params, cbs, jnp.asarray(feat), l1=l1, l2=l2,
                 pitch_lag=1)

    np.testing.assert_array_equal(
        np.asarray(enc["ind1"]).astype(int)[0],
        ind1_m.numpy()[0, :, 0].astype(int))
    np.testing.assert_array_equal(
        np.asarray(enc["ind2"]).astype(int)[0],
        ind2_m.numpy()[0, :, 0].astype(int))
    np.testing.assert_allclose(np.asarray(enc["r_qtz"])[0],
                               r_qtz.numpy()[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(enc["coded"])[0, :, :18],
                               c_in.numpy()[0, :, :18],
                               rtol=1e-4, atol=1e-5)

    # compat-mode decode inverts the compat-mode encode exactly
    dec = decode(params, cbs, enc["ind1"], enc["ind2"], enc["indices"],
                 jnp.asarray(feat[..., 18:]), pitch_lag=1)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(
        enc["coded"]))


# ---------------------------------------------------------------------------
# Forward parity against the reference's OWN model classes
# ---------------------------------------------------------------------------

def test_wavernn_para_forward_matches_reference_class():
    """frame_predictor_para.forward vs the reference's Wavernn_para
    (rnn3 over the flipped trunk output), weights imported via
    utils/torch_import.wavernn_para_to_params."""
    import torch

    from fpsc_tpu.models import frame_predictor_para as fpp
    from fpsc_tpu.utils.torch_import import wavernn_para_to_params

    ref = _load_reference_module("wavernn_para", "models/wavernn_para.py")
    ref.device = "cpu"
    torch.manual_seed(1)
    m = ref.Wavernn_para(in_features=20, gru_units1=24, gru_units2=12,
                         fc_units=18)
    m.eval()
    params, cfg = wavernn_para_to_params(m.state_dict())
    assert cfg.gru_units1 == 24 and cfg.fc_units == 18

    x = (np.random.RandomState(2).randn(2, 9, 20) * 0.3
         ).astype(np.float32)
    with torch.no_grad():
        want_mid, want_out, *_ = m(torch.tensor(x))
    got_mid, got_out, *_ = fpp.forward(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_mid), want_mid.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_out), want_out.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_wavenet_forward_matches_reference_class():
    """models/wavenet.forward vs the reference's own torch Wavenet
    (front conv, gated dilated ResBlocks, fat upsampler with pitch
    embedding + ConvTranspose2d chain), weights imported via
    utils/torch_import.wavenet_to_params.  This pins the causal-padding
    and upsampler-geometry semantics against the real implementation,
    not a reconstruction."""
    import torch

    from fpsc_tpu.models import wavenet as wn
    from fpsc_tpu.utils.torch_import import wavenet_to_params

    ref_loss = _load_reference_module("loss", "loss.py")
    ref_modules = _load_reference_module(
        "modules", "models/modules.py", real_deps={"loss": ref_loss})
    ref_wn = _load_reference_module(
        "wavenet", "models/wavenet.py", real_deps={"modules": ref_modules})

    torch.manual_seed(0)
    m = ref_wn.Wavenet(out_channels=2, num_blocks=1, num_layers=3,
                       inp_channels=1, residual_channels=8,
                       gate_channels=12, skip_channels=8,
                       kernel_size=2, cin_channels=20 + 64,
                       cout_channels=12, upsample_scales=[10, 16],
                       causal=True, local=False, fat_upsampler=True)
    m.eval()
    params = wavenet_to_params(m.state_dict())
    cfg = wn.WavenetConfig(out_channels=2, num_blocks=1, num_layers=3,
                           residual_channels=8, gate_channels=12,
                           skip_channels=8, cout_channels=12,
                           cin_channels=20, front_kernel=32,
                           kernel_size=2, fat_upsampler=True,
                           local=False)

    rng = np.random.RandomState(4)
    b, length = 2, 2
    x = (rng.randn(b, 1, length * 160) * 0.1).astype(np.float32)
    c = (rng.randn(b, 20, length) * 0.3).astype(np.float32)
    periods = rng.randint(32, 250, (b, length)).astype(np.int64)

    with torch.no_grad():
        want = m(torch.tensor(x),
                 torch.tensor(periods[:, :, None]),
                 torch.tensor(c))
    got = wn.forward(params, cfg, jnp.asarray(x),
                     jnp.asarray(periods.astype(np.int32)),
                     jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-3, atol=2e-4)
