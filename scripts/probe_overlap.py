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
    kernel inside one XLA program.  pallas_prepare (ops/lpcnet_sampler
    round-5 split) makes the prologue timeable as its own program; the
    prologue-fraction row bounds the best possible overlap win, and
    the interleave row (prologue program of stream 2 dispatched
    between fused rounds of stream 1) measures whether two programs
    overlap AT ALL on the one TensorCore.  (pallas_sample as its own
    program does not compile at b768 — see the in-code note.)

    python scripts/probe_overlap.py [all|wide|split]
"""
import statistics
import sys
import time

sys.path.insert(0, ".")

import numpy as np

REPS = 7
CHAIN = 4


def main(mode: str = "all"):
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
    wide_cases = ((2, [(feat, periods, lpc),
                       (feat2, periods2, lpc2)]),
                  (3, [(feat, periods, lpc),
                       (feat2, periods2, lpc2),
                       (feat3, periods3, lpc3)]))
    for n_disp, ins in wide_cases if mode in ("all", "wide") else ():
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

    # ---- (b) overlap mechanism check --------------------------------
    if mode not in ("all", "split"):
        return
    # NOTE: running pallas_sample as its OWN program (operands as
    # program parameters) fails the Mosaic/XLA compile at b768 — the
    # (100, 160, 768) kernel output gets scoped to VMEM stack
    # ("allocating on stack ... S(1) ... exceeded scoped vmem limit"),
    # even behind an optimization_barrier; in the fused program the
    # same kernel compiles with the output in HBM.  So the split
    # prep->sample pipeline is not even constructible at this batch.
    # The mechanism question — can two programs overlap on the one
    # TensorCore? — is answerable with programs that DO compile:
    # interleave the prologue-only program and the full fused program
    # on INDEPENDENT inputs.  If total == prologue + fused, programs
    # execute strictly serially and there is no overlap to win.
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

    def interleaved(i):
        # prologue(k) on stream 2 dispatched between fused(k) rounds
        # on stream 1: overlap would shave up to t_prep off the total
        acc = None
        for j in range(CHAIN):
            s = gen(params, feat, periods, lpc,
                    jax.random.PRNGKey(i * CHAIN + j))
            s2 = prep_sum(params, feat2, periods2, lpc2,
                          jax.random.PRNGKey(1000 + i * CHAIN + j))
            s = s + s2
            acc = s if acc is None else acc + s
        float(acc)

    t_mix = timeit(interleaved, "fused + prologue interleaved",
                   per=CHAIN)
    overlap = (t_fused + t_prep - t_mix) / t_prep
    print(f"  fused {t_fused * 1e3:.2f} + prologue {t_prep * 1e3:.2f} "
          f"= {1e3 * (t_fused + t_prep):.2f} ms serial prediction; "
          f"measured {t_mix * 1e3:.2f} ms -> "
          f"{100 * overlap:.0f}% of the prologue overlapped", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
