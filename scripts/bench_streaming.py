"""Streaming (serving) latency benchmark on the real TPU.

Measures per-frame wall time of the stateful StreamingEncoder /
StreamingDecoder / StreamingVocoder at production model sizes, for
1..N batched streams.  On this tunneled device per-call dispatch
(~one network round trip per jitted call) dominates, and the on-chip
per-step cost is batch-independent, so the headroom number that
matters for serving is FRAMES PER 10 ms TICK = how many 10 ms frames
one chip sustains when N streams share each dispatched program.

    python scripts/bench_streaming.py [n_frames] [batches]

batches: comma list of concurrent-stream counts (default 1,8,32,128;
the serving-capacity study late round 4 runs 256,512 — the per-frame
programs are XLA scans with batch-columned matmuls, so stream count
scales the same way the wide-batch sampler does).
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def bench_stage(name, call, frames, batch):
    # warmup (compile) then timed loop; every call returns numpy
    # already (the classes pull their outputs), so wall time per call
    # includes dispatch + compute + result transfer - the real serving
    # cost.
    call(0)
    t0 = time.perf_counter()
    for t in range(1, frames):
        call(t)
    dt = (time.perf_counter() - t0) / (frames - 1)
    rt = 0.010 / dt * batch          # stream-frames per 10 ms budget
    print(f"{name:28s} batch {batch:4d}: {dt * 1e3:7.2f} ms/frame-call "
          f"-> {rt:8.1f}x real-time aggregate")
    return dt


def main(n_frames: int = 50, batches=(1, 8, 32, 128)):
    import jax

    from fpsc_tpu.codec.streaming import (StreamingCodec,
                                          StreamingDecoder,
                                          StreamingEncoder,
                                          StreamingVocoder)
    from fpsc_tpu.models import frame_predictor as fp
    from fpsc_tpu.models import lpcnet

    rng = np.random.RandomState(0)
    fp_params = fp.init_frame_predictor(jax.random.PRNGKey(0))
    cbs = fp.Codebooks(
        scl=jnp_sort(rng.randn(256) * 0.1),
        vq=(jnp_arr(rng.randn(1024, 17) * 0.1),
            jnp_arr(rng.randn(1024, 17) * 0.05)),
        scl_bl=jnp_sort(rng.randn(16) * 0.02),
        vq_bl=(jnp_arr(rng.randn(512, 17) * 0.02),),
    )
    voc_params = lpcnet.init_lpcnet(jax.random.PRNGKey(1))

    results = {}
    for batch in batches:
        feat = (rng.randn(batch, n_frames, 20) * 0.3).astype(np.float32)
        enc = StreamingEncoder(fp_params, cbs, batch=batch)
        dt_e = bench_stage("StreamingEncoder",
                           lambda t: enc.encode_frame(feat[:, t]),
                           n_frames, batch)
        out = enc.encode_frame(feat[:, 0])
        dec = StreamingDecoder(fp_params, cbs, batch=batch)
        dt_d = bench_stage(
            "StreamingDecoder",
            lambda t: dec.decode_frame(out["ind1"], out["ind2"],
                                       out["indices"], feat[:, t, 18:]),
            n_frames, batch)
        voc = StreamingVocoder(voc_params, batch=batch)
        dt_v = bench_stage("StreamingVocoder",
                           lambda t: voc.synthesize_frame(feat[:, t]),
                           n_frames, batch)
        total = dt_e + dt_d + dt_v
        print(f"{'full chain (3 dispatches)':28s} batch {batch:4d}: "
              f"{total * 1e3:7.2f} ms/frame "
              f"({'REAL-TIME OK' if total < 0.010 else 'over budget'} "
              f"per tick; {0.010 / total * batch:.1f} stream-frames/"
              f"10ms)", flush=True)
        fused = StreamingCodec(fp_params, cbs, voc_params, batch=batch)
        dt_f = bench_stage("StreamingCodec (fused)",
                           lambda t: fused.process_frame(feat[:, t]),
                           n_frames, batch)

        # far-end receiver: concealing decode + vocoder in one program
        # (10% of ticks arrive flagged lost — the concealment branch
        # is part of the compiled tick either way)
        from fpsc_tpu.codec.streaming import StreamingReceiver
        recv = StreamingReceiver(fp_params, cbs, voc_params,
                                 batch=batch)
        lost_col = rng.rand(n_frames, batch) < 0.1
        dt_r = bench_stage(
            "StreamingReceiver (conceal)",
            lambda t: recv.process_symbols(
                out["ind1"], out["ind2"], out["indices"],
                feat[:, t, 18:], lost=lost_col[t]),
            n_frames, batch)

        # device-RESIDENT fused tick: chain K ticks with states held
        # on device and ONE scalar pull at the end.  The per-call
        # rows above pay a ~35 ms tunnel round trip per tick (the
        # real serving cost through THIS dev tunnel); this row
        # removes that environment artifact and measures the chip's
        # true per-tick cost - what a co-located deployment pays.
        import jax.numpy as jnp
        K = 200
        keys = jax.random.split(jax.random.PRNGKey(5), K)
        f0 = jnp.asarray(feat[:, 0])
        es, ds, vs = fused.enc_state, fused.dec_state, fused.voc_state
        es, ds, vs, y_dev = fused._tick(es, ds, vs, keys[0], f0)
        float(jnp.sum(y_dev))                   # compile + warm
        t0 = time.perf_counter()
        for t in range(K):
            es, ds, vs, y_dev = fused._tick(es, ds, vs, keys[t], f0)
        float(jnp.sum(y_dev))
        dt_dev = (time.perf_counter() - t0) / K
        print(f"{'fused tick (device-resident)':28s} batch "
              f"{batch:4d}: {dt_dev * 1e3:7.2f} ms/tick on-chip "
              f"-> {0.010 / dt_dev * batch:8.1f}x real-time aggregate",
              flush=True)

        # device-resident receiver tick (conceal path compiled in)
        i1_d = jnp.asarray(np.atleast_1d(np.asarray(out["ind1"])))
        i2_d = jnp.asarray(np.atleast_1d(np.asarray(out["ind2"])))
        idx_d = {k: jnp.asarray(np.atleast_2d(np.asarray(v))
                                if k in ("vq", "vq_bl")
                                else np.atleast_1d(np.asarray(v)))
                 for k, v in out["indices"].items()}
        pit_d = jnp.asarray(feat[:, 0, 18:])
        lost_d = jnp.zeros((batch,), bool)
        rs, rv = recv.dec_state, recv.voc_state
        rs1, rv1, rout = recv._tick(rs, rv, keys[0], i1_d, i2_d,
                                    idx_d, pit_d, lost_d)
        float(jnp.sum(rout))
        t0 = time.perf_counter()
        for t in range(K):
            rs, rv, rout = recv._tick(rs, rv, keys[t], i1_d, i2_d,
                                      idx_d, pit_d, lost_d)
        float(jnp.sum(rout))
        dt_rdev = (time.perf_counter() - t0) / K
        print(f"{'receiver tick (device-res.)':28s} batch "
              f"{batch:4d}: {dt_rdev * 1e3:7.2f} ms/tick on-chip "
              f"-> {0.010 / dt_rdev * batch:8.1f}x real-time "
              f"aggregate", flush=True)

        # mic-to-speech: the SAME fused tick fed raw 10 ms PCM blocks
        # (on-device analysis frontend folded into the program)
        pcm = (rng.randn(batch, n_frames, 160) * 0.1).astype(np.float32)
        pcmc = StreamingCodec(fp_params, cbs, voc_params, batch=batch,
                              from_pcm=True)
        dt_p = bench_stage("StreamingCodec (from PCM)",
                           lambda t: pcmc.process_pcm(pcm[:, t]),
                           n_frames, batch)

        # transmit-side tick: mic PCM -> frontend -> closed-loop
        # encode -> symbols, ONE compiled program (encoder-only
        # deployment; previously ran as the 2-dispatch Frontend +
        # Encoder chain — VERDICT r4 next #3)
        from fpsc_tpu.codec.streaming import StreamingTransmitter
        txc = StreamingTransmitter(fp_params, cbs, batch=batch)
        dt_t = bench_stage("StreamingTransmitter (fused)",
                           lambda t: txc.process_pcm(pcm[:, t]),
                           n_frames, batch)

        # device-RESIDENT transmitter tick (same RTT-amortised method
        # as the duplex/receiver device rows below)
        import jax.numpy as _jnp
        Kt = 200
        p0 = _jnp.asarray(pcm[:, 0])
        fs, es = txc.front_state, txc.enc_state
        fs, es, pk = txc._tick(fs, es, p0)
        float(_jnp.sum(pk))                     # compile + warm
        t0 = time.perf_counter()
        for _ in range(Kt):
            fs, es, pk = txc._tick(fs, es, p0)
        float(_jnp.sum(pk))
        dt_tdev = (time.perf_counter() - t0) / Kt
        print(f"{'transmit tick (device-res.)':28s} batch "
              f"{batch:4d}: {dt_tdev * 1e3:7.2f} ms/tick on-chip "
              f"-> {0.010 / dt_tdev * batch:8.1f}x real-time "
              f"aggregate", flush=True)

        # host-side streaming ENTROPY layer (range_coder.Streaming*):
        # one independent codec per stream, pure numpy — runs on the
        # host CPU concurrently with the device tick, so its budget
        # is the same 10 ms wall
        from fpsc_tpu.codec import range_coder as rc
        sizes = {"scl": 256, "scl_bl": 16, "vq": [1024, 1024],
                 "vq_bl": [512]}
        rencs = [rc.StreamingRangeEncoder(sizes) for _ in range(batch)]
        rdecs = [rc.StreamingRangeDecoder(sizes) for _ in range(batch)]
        i1s = rng.rand(n_frames, batch) < 0.1
        i2s = rng.rand(n_frames, batch) < 0.3
        rows = [[{"scl": rng.randint(256) if i1s[t, b] else -1,
                  "scl_bl": -1 if i1s[t, b] else rng.randint(16),
                  "vq": rng.randint(1024, size=2) if i2s[t, b]
                  else [-1, -1],
                  "vq_bl": [rng.randint(512)] if not i2s[t, b]
                  else [-1]}
                 for b in range(batch)] for t in range(n_frames)]
        pcs = rng.randint(0, 250, size=(n_frames, batch, 2))
        pcs[..., 1] = np.minimum(pcs[..., 1] % 8, 7)

        def rc_tick(t):
            for b in range(batch):
                chunk = rencs[b].push_frame(
                    i1s[t, b], i2s[t, b], rows[t][b], pcs[t, b])
                rdecs[b].push_bytes(chunk)
                rdecs[b].pull_frame()
        bench_stage("entropy enc+dec (host)", rc_tick, n_frames, batch)

        # the NATIVE C++ entropy backend (cpp/range_coder.cpp) —
        # byte-identical streams, same API, measured ~36x faster
        from fpsc_tpu.codec import native_rc
        if native_rc.available():
            nencs = [native_rc.NativeStreamingRangeEncoder(sizes)
                     for _ in range(batch)]
            ndecs = [native_rc.NativeStreamingRangeDecoder(sizes)
                     for _ in range(batch)]

            def nrc_tick(t):
                for b in range(batch):
                    chunk = nencs[b].push_frame(
                        i1s[t, b], i2s[t, b], rows[t][b], pcs[t, b])
                    ndecs[b].push_bytes(chunk)
                    ndecs[b].pull_frame()
            bench_stage("entropy enc+dec (native C++)", nrc_tick,
                        n_frames, batch)

            # BANK path (round 5, VERDICT r4 next #4): ONE library
            # call per tick for the whole batch — the per-stream
            # loop above pays ~100 us of Python/ctypes overhead per
            # stream, capping one host core at ~85 streams; the bank
            # amortises it to ~10 us/stream (512 full-duplex streams
            # in ~4.2 ms on ONE core).  n_threads stays 1 on this
            # single-core host; rc_enc_push_many/rc_dec_tick_many
            # split across std::threads on multi-core serving hosts.
            ebank = native_rc.NativeRangeEncoderBank(batch, sizes)
            dbank = native_rc.NativeRangeDecoderBank(batch, sizes)
            bscl = np.asarray(
                [[r["scl"] for r in rows[t]] for t in range(n_frames)])
            bscl_bl = np.asarray(
                [[r["scl_bl"] for r in rows[t]]
                 for t in range(n_frames)])
            bvq = np.asarray(
                [[r["vq"] for r in rows[t]] for t in range(n_frames)])
            bvq_bl = np.asarray(
                [[r["vq_bl"] for r in rows[t]]
                 for t in range(n_frames)])

            def bank_tick(t):
                idx = {"scl": bscl[t], "scl_bl": bscl_bl[t],
                       "vq": bvq[t], "vq_bl": bvq_bl[t]}
                chunks, lens = ebank.push_frames(i1s[t], i2s[t], idx,
                                                 pcs[t])
                dbank.tick(chunks, lens)
            bench_stage("entropy enc+dec (native bank)", bank_tick,
                        n_frames, batch)
        results[batch] = (dt_e, dt_d, dt_v, total, dt_f, dt_p)
    return results


def jnp_arr(a):
    import jax.numpy as jnp
    return jnp.asarray(np.asarray(a, np.float32))


def jnp_sort(a):
    import jax.numpy as jnp
    return jnp.asarray(np.sort(np.asarray(a, np.float32)))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50,
         tuple(int(b) for b in sys.argv[2].split(","))
         if len(sys.argv) > 2 else (1, 8, 32, 128))
