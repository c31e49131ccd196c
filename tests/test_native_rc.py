"""Parity tests for the native C++ range-coder runtime
(cpp/range_coder.cpp via fpsc_tpu/codec/native_rc.py).

The Python module fpsc_tpu/codec/range_coder.py is the reference
implementation; the native runtime must match it BYTE-FOR-BYTE on the
wire and symbol-for-symbol on decode, across fuzzed codebook
geometries, priors, value-rank orders and static-model overrides —
including the streaming classes' speculative-decode rollback path.
"""
import numpy as np
import pytest

from fpsc_tpu.codec import bitstream as bs
from fpsc_tpu.codec import range_coder as rc

native_rc = pytest.importorskip("fpsc_tpu.codec.native_rc")
if not native_rc.available():
    pytest.skip("native range coder did not build", allow_module_level=True)


def _random_stream(rng, sizes, length):
    ind1 = rng.rand(length) < rng.rand()
    ind2 = rng.rand(length) < rng.rand()
    idx = {
        "scl": np.where(ind1, rng.randint(sizes["scl"], size=length),
                        -1),
        "scl_bl": np.where(~ind1 & (sizes.get("scl_bl", 0) > 0),
                           rng.randint(max(sizes.get("scl_bl", 0), 1),
                                       size=length), -1),
        "vq": np.stack([np.where(ind2, rng.randint(e, size=length), -1)
                        for e in sizes["vq"]], 1),
        "vq_bl": (np.stack([np.where(~ind2,
                                     rng.randint(e, size=length), -1)
                            for e in sizes["vq_bl"]], 1)
                  if sizes.get("vq_bl")
                  else np.full((length, 1), -1)),
    }
    pitch = np.stack([(rng.randint(32, 288, length) - 100.0) / 50.0,
                      rng.uniform(-0.5, 0.4, length)], 1)
    return ind1, ind2, idx, bs.quantize_pitch(pitch)


def _random_sizes(rng):
    return {
        "scl": int(rng.choice([4, 12, 16, 256])),
        "scl_bl": int(rng.choice([0, 4, 6, 16])),
        "vq": [int(rng.choice([8, 64, 96, 1024]))
               for _ in range(rng.randint(1, 4))],
        "vq_bl": [int(rng.choice([8, 48, 512]))
                  for _ in range(rng.randint(0, 3))],
    }


def _assert_unpack_equal(got, ref):
    np.testing.assert_array_equal(got["ind1"], ref["ind1"])
    np.testing.assert_array_equal(got["ind2"], ref["ind2"])
    for k in ("scl", "scl_bl", "vq", "vq_bl"):
        np.testing.assert_array_equal(got["indices"][k],
                                      ref["indices"][k], err_msg=k)
    np.testing.assert_allclose(got["pitch"], ref["pitch"])


def test_offline_pack_byte_parity_fuzz():
    """Native pack == Python pack byte-for-byte; native unpack ==
    Python unpack symbol-for-symbol, across fuzzed geometries with
    priors and value-rank orders."""
    rng = np.random.RandomState(23)
    for trial in range(14):
        sizes = _random_sizes(rng)
        length = rng.randint(1, 60)
        ind1, ind2, idx, pcodes = _random_stream(rng, sizes, length)
        orders = None
        pri = None
        if trial % 3 == 1:
            orders = {"scl": rng.permutation(sizes["scl"])}
            if sizes["scl_bl"]:
                orders["scl_bl"] = rng.permutation(sizes["scl_bl"])
        if trial % 2 == 1:
            pri = rc.collect_priors([(ind1, ind2, idx, pcodes)], sizes,
                                    orders=orders)
        py = rc.pack_utterance_rc(ind1, ind2, idx, pcodes, sizes,
                                  priors=pri, orders=orders)
        nat = native_rc.pack_utterance_rc(ind1, ind2, idx, pcodes,
                                          sizes, priors=pri,
                                          orders=orders)
        assert py == nat, f"trial {trial}: payload bytes differ"
        _assert_unpack_equal(
            native_rc.unpack_utterance_rc(py, sizes, priors=pri,
                                          orders=orders),
            rc.unpack_utterance_rc(py, sizes, priors=pri,
                                   orders=orders))


def test_offline_pack_static_models_parity():
    """A static FreqTable override (usage-derived, non-adaptive) must
    transcode identically on both backends."""
    rng = np.random.RandomState(5)
    sizes = {"scl": 16, "scl_bl": 4, "vq": [64, 64], "vq_bl": [48]}
    ind1, ind2, idx, pcodes = _random_stream(rng, sizes, 80)
    static = rc.build_models({"vq_0": rng.randint(1, 50, 64),
                              "pitch_abs": rng.randint(1, 9, 256)})
    py = rc.pack_utterance_rc(ind1, ind2, idx, pcodes, sizes,
                              static_models=static)
    nat = native_rc.pack_utterance_rc(ind1, ind2, idx, pcodes, sizes,
                                      static_models=static)
    assert py == nat
    _assert_unpack_equal(
        native_rc.unpack_utterance_rc(py, sizes, static_models=static),
        rc.unpack_utterance_rc(py, sizes, static_models=static))


def test_streaming_lockstep_matches_python_pair():
    """Frame-by-frame: native encoder emits the same bytes as the
    Python encoder, and the native decoder pulls the same frames at
    the same byte positions (the speculative rollback path runs every
    frame under byte starvation)."""
    rng = np.random.RandomState(3)
    sizes = {"scl": 256, "scl_bl": 16, "vq": [1024, 1024],
             "vq_bl": [512]}
    L = 120
    ind1, ind2, idx, pcodes = _random_stream(rng, sizes, L)
    orders = {"scl": rng.permutation(256),
              "scl_bl": rng.permutation(16)}
    pri = rc.collect_priors([(ind1, ind2, idx, pcodes)], sizes,
                            orders=orders)
    pe = rc.StreamingRangeEncoder(sizes, priors=pri, orders=orders)
    ne = native_rc.NativeStreamingRangeEncoder(sizes, priors=pri,
                                               orders=orders)
    pd = rc.StreamingRangeDecoder(sizes, priors=pri, orders=orders)
    nd = native_rc.NativeStreamingRangeDecoder(sizes, priors=pri,
                                               orders=orders)
    frames_py, frames_nat = [], []

    def drain():
        while True:
            fp, fn = pd.pull_frame(), nd.pull_frame()
            assert (fp is None) == (fn is None)
            if fp is None:
                return
            frames_py.append(fp)
            frames_nat.append(fn)

    for t in range(L):
        row = {"scl": idx["scl"][t], "scl_bl": idx["scl_bl"][t],
               "vq": idx["vq"][t], "vq_bl": idx["vq_bl"][t]}
        bp = pe.push_frame(ind1[t], ind2[t], row, pcodes[t])
        bn = ne.push_frame(ind1[t], ind2[t], row, pcodes[t])
        assert bp == bn, f"frame {t}: streamed bytes differ"
        pd.push_bytes(bp)
        nd.push_bytes(bn)
        drain()
    bp, bn = pe.finish(), ne.finish()
    assert bp == bn
    pd.push_bytes(bp, final=True)
    nd.push_bytes(bn, final=True)
    while len(frames_py) < L:
        fp, fn = pd.pull_frame(), nd.pull_frame()
        assert fp is not None and fn is not None
        frames_py.append(fp)
        frames_nat.append(fn)
    for t in range(L):
        fp, fn = frames_py[t], frames_nat[t]
        assert fp["ind1"] == fn["ind1"] == bool(ind1[t])
        assert fp["ind2"] == fn["ind2"] == bool(ind2[t])
        assert fp["indices"]["scl"] == fn["indices"]["scl"]
        assert fp["indices"]["scl_bl"] == fn["indices"]["scl_bl"]
        np.testing.assert_array_equal(np.asarray(fp["indices"]["vq"]),
                                      fn["indices"]["vq"])
        np.testing.assert_array_equal(
            np.asarray(fp["indices"]["vq_bl"]), fn["indices"]["vq_bl"])
        np.testing.assert_array_equal(np.asarray(fp["pcodes"]),
                                      fn["pcodes"])
        np.testing.assert_array_equal(np.asarray(fn["pcodes"]),
                                      pcodes[t])


def test_streaming_byte_stream_matches_offline_body():
    """The native streaming encoder's byte stream must equal the
    offline packer's body (no per-frame flush), as the Python one
    does."""
    rng = np.random.RandomState(9)
    sizes = {"scl": 16, "scl_bl": 4, "vq": [64], "vq_bl": []}
    L = 50
    ind1, ind2, idx, pcodes = _random_stream(rng, sizes, L)
    enc = native_rc.NativeStreamingRangeEncoder(sizes)
    stream = b""
    for t in range(L):
        row = {"scl": idx["scl"][t], "scl_bl": idx["scl_bl"][t],
               "vq": idx["vq"][t], "vq_bl": idx["vq_bl"][t]}
        stream += enc.push_frame(ind1[t], ind2[t], row, pcodes[t])
    stream += enc.finish()
    offline = native_rc.pack_utterance_rc(ind1, ind2, idx, pcodes,
                                          sizes)
    assert stream == offline[2:]  # offline prepends the length header


def test_native_faster_than_python():
    """The point of the native runtime: a sanity floor on the speedup
    (measured ~36x; assert a conservative 5x so CI noise never
    flakes)."""
    import time

    rng = np.random.RandomState(17)
    sizes = {"scl": 256, "scl_bl": 16, "vq": [1024, 1024],
             "vq_bl": [512]}
    L = 400
    ind1, ind2, idx, pcodes = _random_stream(rng, sizes, L)

    def run(mod):
        t0 = time.perf_counter()
        mod.pack_utterance_rc(ind1, ind2, idx, pcodes, sizes)
        return time.perf_counter() - t0

    run(native_rc)  # warm the lib/load path
    t_nat = min(run(native_rc) for _ in range(3))
    t_py = run(rc)
    assert t_py / t_nat > 5, (t_py, t_nat)
