"""How expensive are the wide-batch per-row output stores?

Past one 128-lane tile, Mosaic's alignment prover rejects multi-row
dynamic sublane stores at non-8-aligned offsets, so the sampler
(ops/lpcnet_sampler.py step2/step4) stores each sample row
individually.  An unaligned single-row store can cost a
read-modify-write of the full 8-sublane tile, so bunch4 pays 4 such
stores per chain step.  The alternative is restructuring the loop to
run 8 samples per body and store one provably 8-aligned (8, B) block.
This probe isolates the two store patterns at the headline geometry:

  per_row   T iterations, each storing (1, B) at pl.ds(t, 1)
  block8    T/8 iterations, each storing (8, B) at pl.ds(8*t, 8)
  none      same loop, no store (baseline: loop + compute overhead)

    python scripts/probe_wide_store.py [b] [rows]

One line per arm: median us/row over 9 reps (RTT-amortised).
"""
import statistics
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(b=768, rows=2048):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x0 = jnp.asarray(np.random.RandomState(0)
                     .randn(8, b).astype(np.float32))

    def make(arm):
        def kernel(x_ref, o_ref):
            def body(t, carry):
                carry = carry + 1e-6
                if arm == "per_row":
                    o_ref[pl.ds(t, 1), :] = carry[:1]
                elif arm == "block8":
                    o_ref[pl.ds(8 * t, 8), :] = carry
                return carry
            n = rows if arm == "per_row" else rows // 8
            out = jax.lax.fori_loop(0, n, body, x_ref[:])
            o_ref[pl.ds(0, 8), :] = out
        return kernel

    for arm in ("none", "per_row", "block8"):
        try:
            f = jax.jit(lambda x, arm=arm: pl.pallas_call(
                make(arm),
                out_shape=jax.ShapeDtypeStruct((rows, b), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x))
            float(jnp.sum(f(x0)))
        except Exception as e:
            print(f"{arm}: COMPILE/RUN FAIL: {str(e)[-300:]}",
                  flush=True)
            continue
        times = []
        for _ in range(9):
            t0 = time.perf_counter()
            acc = jnp.sum(f(x0))
            for _ in range(3):
                acc = acc + jnp.sum(f(x0))
            float(acc)
            times.append((time.perf_counter() - t0) / 4)
        med = statistics.median(times) / rows * 1e6
        print(f"{arm:8s}: {med:.3f} us/row", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
