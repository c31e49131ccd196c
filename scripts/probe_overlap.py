"""Round-5 probe (VERDICT r4 next #1): serving beyond 768 streams +
the conditioning/sampling overlap question.

(a) WIDE SERVING: b896/b1024 kernels hit the Mosaic compile cliff, so
    >768-stream serving must chain multiple b768 dispatches.  The
    "throughput-neutral by construction" claim (TPU programs execute
    serially on the one TensorCore) was reasoning, not data — this
    probe records actual 1536- and 2304-stream rows (2x/3x b768
    chained device-side, one scalar pull) next to the single-b768 row.

(b) OVERLAP: the frame-rate prologue (conditioning net + uniforms +
    feature-major transposes) runs serially before the sampling
    kernel inside one XLA program.  pallas_prepare/pallas_sample
    (ops/lpcnet_sampler.py round-5 split) lets us measure the
    prologue and kernel as separate programs and try a host-side
    software pipeline: dispatch batch k+1's prepare right after batch
    k's sample.  On a single TensorCore two programs cannot overlap —
    the pipeline row vs the serial row IS the mechanism check; the
    prologue-fraction row bounds the best possible win.

    python scripts/probe_overlap.py
"""
import statistics
import sys
import time

sys.path.insert(0, ".")

import numpy as np

REPS = 7
CHAIN = 4


def main():
    import jax
    import jax.numpy as jnp

    from fpsc_tpu.dsp import constants as C
    from fpsc_tpu.models import lpcnet, lpcnet_bunched
    from fpsc_tpu.ops.lpcnet_sampler import (pallas_generate,
                                             pallas_prepare,
                                             pallas_sample)

    frames = 100
    seconds = frames * C.FRAME_SIZE / C.SAMPLE_RATE
    b = 768
    cfg = lpcnet.LPCNetConfig(gru_b_units=64)
    params = lpcnet_bunched.init_bunched4(jax.random.PRNGKey(0), cfg)

    def inputs(seed):
        r = np.random.RandomState(seed)
        return (jnp.asarray(r.randn(b, frames, 20).astype(np.float32) * .3),
                jnp.asarray(r.randint(32, 256, (b, frames))
                            .astype(np.int32)),
                jnp.asarray(r.randn(b, frames, 16).astype(np.float32) * .05))

    feat, periods, lpc = inputs(0)
    feat2, periods2, lpc2 = inputs(1)
    feat3, periods3, lpc3 = inputs(2)

    def timeit(fn, label, per=1):
        fn(0)                                   # compile + warm
        fn(1)
        times = []
        for i in range(REPS):
            t0 = time.perf_counter()
            fn(2 + i)
            times.append((time.perf_counter() - t0) / per)
        med = statistics.median(times)
        spread = 100 * (max(times) - min(times)) / med
        print(f"{label:42s}: {med * 1e3:8.2f} ms  "
              f"(spread {spread:4.1f}%)", flush=True)
        return med

    # ---- fused single-program baseline at b768 (bench.py headline) --
    gen = jax.jit(lambda p, f, pe, l, k: jnp.sum(
        pallas_generate(p, f, pe, l, k)))

    def fused(i):
        acc = gen(params, feat, periods, lpc, jax.random.PRNGKey(i))
        for j in range(1, CHAIN):
            acc = acc + gen(params, feat, periods, lpc,
                            jax.random.PRNGKey(i * CHAIN + j))
        float(acc)

    t_fused = timeit(fused, "fused b768 (per dispatch)", per=CHAIN)
    print(f"  -> single-b768 aggregate RTF "
          f"{b * seconds / t_fused:8.1f}x", flush=True)

    # ---- (a) chained multi-dispatch wide serving ---------------------
    for n_disp, ins in ((2, [(feat, periods, lpc),
                             (feat2, periods2, lpc2)]),
                        (3, [(feat, periods, lpc),
                             (feat2, periods2, lpc2),
                             (feat3, periods3, lpc3)])):
        def multi(i, ins=ins, n=n_disp):
            acc = None
            for j in range(CHAIN):
                for d, (f, pe, l) in enumerate(ins):
                    s = gen(params, f, pe, l,
                            jax.random.PRNGKey(i * CHAIN * n + j * n + d))
                    acc = s if acc is None else acc + s
            float(acc)

        t = timeit(multi, f"{n_disp}x b768 chained "
                   f"({n_disp * b} streams, per round)", per=CHAIN)
        agg = n_disp * b * seconds / t
        print(f"  -> {n_disp * b}-stream aggregate RTF {agg:8.1f}x  "
              f"(vs {n_disp}x-neutral "
              f"{b * seconds / t_fused:8.1f}x; overhead "
              f"{100 * (t / n_disp - t_fused) / t_fused:+.1f}%)",
              flush=True)

    # ---- (b) prologue/kernel split ----------------------------------
    prep = jax.jit(lambda p, f, pe, l, k: pallas_prepare(
        p, f, pe, l, k)[0])
    _, meta = pallas_prepare(params, feat, periods, lpc,
                             jax.random.PRNGKey(0))
    samp = jax.jit(lambda ops: jnp.sum(pallas_sample(ops, meta)))

    prep_sum = jax.jit(lambda p, f, pe, l, k: sum(
        jnp.sum(o.astype(jnp.float32))
        for o in pallas_prepare(p, f, pe, l, k)[0][:5]))

    def prologue(i):
        acc = prep_sum(params, feat, periods, lpc, jax.random.PRNGKey(i))
        for j in range(1, CHAIN):
            acc = acc + prep_sum(params, feat, periods, lpc,
                                 jax.random.PRNGKey(i * CHAIN + j))
        float(acc)

    t_prep = timeit(prologue, "prologue only (per dispatch)", per=CHAIN)
    print(f"  -> prologue fraction of fused program: "
          f"{100 * t_prep / t_fused:.1f}% (upper bound on any "
          f"overlap win)", flush=True)

    def split_serial(i):
        acc = None
        for j in range(CHAIN):
            ops = prep(params, feat, periods, lpc,
                       jax.random.PRNGKey(i * CHAIN + j))
            s = samp(ops)
            acc = s if acc is None else acc + s
        float(acc)

    t_serial = timeit(split_serial, "split serial prep->sample",
                      per=CHAIN)

    def split_pipelined(i):
        # software pipeline: batch j+1's prepare is dispatched while
        # batch j's sample is (nominally) in flight
        ops = prep(params, feat, periods, lpc,
                   jax.random.PRNGKey(i * CHAIN))
        acc = None
        for j in range(CHAIN):
            nxt = (prep(params, feat2, periods2, lpc2,
                        jax.random.PRNGKey(i * CHAIN + j + 1))
                   if j + 1 < CHAIN else None)
            s = samp(ops)
            acc = s if acc is None else acc + s
            ops = nxt
        float(acc)

    t_pipe = timeit(split_pipelined, "split pipelined prep(k+1)||sample(k)",
                    per=CHAIN)
    print(f"  fused {t_fused * 1e3:.2f} ms | split serial "
          f"{t_serial * 1e3:.2f} | split pipelined {t_pipe * 1e3:.2f} "
          f"(pipelining saves "
          f"{100 * (t_serial - t_pipe) / t_serial:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
