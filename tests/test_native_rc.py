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


def test_bank_matches_independent_streams():
    """NativeRangeEncoderBank / NativeRangeDecoderBank (ONE library
    call per tick for all streams) must be byte-identical to N
    independent per-stream encoders and round-trip every symbol,
    including the byte-starvation rollback path (the bank pulls at
    most one frame per stream per tick, so a starved stream lags one
    tick and catches up)."""
    rng = np.random.RandomState(17)
    sizes = {"scl": 256, "scl_bl": 16, "vq": [1024, 1024],
             "vq_bl": [512]}
    N, L = 7, 60
    streams = [_random_stream(np.random.RandomState(100 + i), sizes, L)
               for i in range(N)]
    orders = {"scl": rng.permutation(256), "scl_bl": rng.permutation(16)}
    pri = rc.collect_priors([streams[0]], sizes, orders=orders)

    bank = native_rc.NativeRangeEncoderBank(N, sizes, priors=pri,
                                            orders=orders)
    singles = [native_rc.NativeStreamingRangeEncoder(
        sizes, priors=pri, orders=orders) for _ in range(N)]
    dbank = native_rc.NativeRangeDecoderBank(N, sizes, priors=pri,
                                             orders=orders)
    decoded = [[] for _ in range(N)]

    def collect(ok, frames):
        # past final=True the non-strict decoder fabricates frames
        # beyond the true stream end (same as StreamingRangeDecoder —
        # callers know the frame count), so stop collecting at L
        for i in range(N):
            if ok[i] and len(decoded[i]) < L:
                decoded[i].append({
                    "ind1": bool(frames["ind1"][i]),
                    "ind2": bool(frames["ind2"][i]),
                    "scl": int(frames["indices"]["scl"][i]),
                    "scl_bl": int(frames["indices"]["scl_bl"][i]),
                    "vq": frames["indices"]["vq"][i].copy(),
                    "vq_bl": frames["indices"]["vq_bl"][i].copy(),
                    "pcodes": frames["pcodes"][i].copy()})

    for t in range(L):
        i1 = np.asarray([s[0][t] for s in streams])
        i2 = np.asarray([s[1][t] for s in streams])
        idx = {"scl": np.asarray([s[2]["scl"][t] for s in streams]),
               "scl_bl": np.asarray([s[2]["scl_bl"][t]
                                     for s in streams]),
               "vq": np.stack([s[2]["vq"][t] for s in streams]),
               "vq_bl": np.stack([s[2]["vq_bl"][t] for s in streams])}
        pc = np.stack([s[3][t] for s in streams])
        chunks, lens = bank.push_frames(i1, i2, idx, pc)
        for i in range(N):
            row = {"scl": idx["scl"][i], "scl_bl": idx["scl_bl"][i],
                   "vq": idx["vq"][i], "vq_bl": idx["vq_bl"][i]}
            want = singles[i].push_frame(i1[i], i2[i], row, pc[i])
            got = bytes(chunks[i, :lens[i]].tobytes())
            assert got == want, f"stream {i} frame {t}: bytes differ"
        ok, frames = dbank.tick(chunks, lens)
        collect(ok, frames)

    # flush: per-stream finish bytes through the list-of-bytes API
    tails = [singles[i].finish() for i in range(N)]
    ok, frames = dbank.tick(tails, final=True)
    collect(ok, frames)
    empty = [b""] * N
    for _ in range(8):
        if all(len(d) >= L for d in decoded):
            break
        ok, frames = dbank.tick(empty, final=True)
        collect(ok, frames)

    for i, (ind1, ind2, idx, pcodes) in enumerate(streams):
        assert len(decoded[i]) == L, f"stream {i}: {len(decoded[i])}/{L}"
        for t in range(L):
            d = decoded[i][t]
            assert d["ind1"] == bool(ind1[t])
            assert d["ind2"] == bool(ind2[t])
            if ind1[t]:
                assert d["scl"] == idx["scl"][t]
            else:
                assert d["scl_bl"] == idx["scl_bl"][t]
            if ind2[t]:
                np.testing.assert_array_equal(d["vq"], idx["vq"][t])
            else:
                np.testing.assert_array_equal(d["vq_bl"],
                                              idx["vq_bl"][t])
            np.testing.assert_array_equal(d["pcodes"], pcodes[t])


def test_bank_threaded_matches_single_threaded():
    """n_threads is a pure partition of independent streams: the
    threaded bank must produce byte-identical chunks to n_threads=1
    (this dev host has one core, so this checks correctness, not
    speed — the speed row lives in scripts/bench_streaming.py)."""
    sizes = {"scl": 16, "scl_bl": 4, "vq": [64], "vq_bl": [48]}
    N, L = 9, 25
    streams = [_random_stream(np.random.RandomState(200 + i), sizes, L)
               for i in range(N)]
    b1 = native_rc.NativeRangeEncoderBank(N, sizes, n_threads=1)
    b4 = native_rc.NativeRangeEncoderBank(N, sizes, n_threads=4)
    for t in range(L):
        i1 = np.asarray([s[0][t] for s in streams])
        i2 = np.asarray([s[1][t] for s in streams])
        idx = {"scl": np.asarray([s[2]["scl"][t] for s in streams]),
               "scl_bl": np.asarray([s[2]["scl_bl"][t]
                                     for s in streams]),
               "vq": np.stack([s[2]["vq"][t] for s in streams]),
               "vq_bl": np.stack([s[2]["vq_bl"][t] for s in streams])}
        pc = np.stack([s[3][t] for s in streams])
        c1, l1 = bank_copy = b1.push_frames(i1, i2, idx, pc)
        c1, l1 = c1.copy(), l1.copy()
        c4, l4 = b4.push_frames(i1, i2, idx, pc)
        np.testing.assert_array_equal(l1, l4)
        for i in range(N):
            np.testing.assert_array_equal(c1[i, :l1[i]], c4[i, :l4[i]])
