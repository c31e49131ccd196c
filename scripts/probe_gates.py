"""What do the GRU gate elementwise passes cost at wide batch?

After the matmul-CDF change the bunch4 b768 step still runs ~25% off
the analytic MXU ceiling.  The remaining VPU work per chain step:
GRU_A gate math on (3*384, 768) pre-activations (sigmoid x2, tanh,
blend - ~10 passes of (384, 768)), GRU_B's same shape at 16 units
(negligible), 4 draws' residue, and the mu-law index+one-hot builds.
This probe isolates ONE GRU_A gate evaluation:

  gates_f32   production gate math (f32 states, f32 elementwise)
  gates_bf16  adds/muls/blend in bf16, transcendentals f32 (Mosaic
              rejects bf16 transcendentals), state carried f32
  none        loop overhead baseline

    python scripts/probe_gates.py [b] [iters]

Median us/gate-eval over 9 reps (RTT-amortised, one pull per rep).
"""
import statistics
import sys
import time

sys.path.insert(0, ".")

import numpy as np

H = 384


def main(b=768, iters=512):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    pre0 = jnp.asarray(rng.randn(3 * H, b).astype(np.float32))
    gh0 = jnp.asarray(rng.randn(3 * H, b).astype(np.float32))
    h0 = jnp.asarray(rng.randn(H, b).astype(np.float32) * 0.1)

    def make(arm):
        def kernel(pre_ref, gh_ref, h_ref, o_ref):
            pre = pre_ref[:]
            gh = gh_ref[:]

            def gates_f32(h):
                z = jax.nn.sigmoid(pre[:H] + gh[:H])
                r = jax.nn.sigmoid(pre[H:2 * H] + gh[H:2 * H])
                n = jnp.tanh(pre[2 * H:] + r * gh[2 * H:])
                return (1.0 - z) * n + z * h

            def gates_bf16(h):
                p16 = pre.astype(jnp.bfloat16)
                g16 = gh.astype(jnp.bfloat16)
                z = jax.nn.sigmoid((p16[:H] + g16[:H])
                                   .astype(jnp.float32))
                r = jax.nn.sigmoid((p16[H:2 * H] + g16[H:2 * H])
                                   .astype(jnp.float32))
                n = jnp.tanh((p16[2 * H:]
                              + r.astype(jnp.bfloat16) * g16[2 * H:])
                             .astype(jnp.float32))
                return ((1.0 - z).astype(jnp.bfloat16)
                        * n.astype(jnp.bfloat16)).astype(jnp.float32) \
                    + z * h

            def body(t, h):
                if arm == "none":
                    return h + 1e-6
                h = gates_bf16(h) if arm == "gates_bf16" \
                    else gates_f32(h)
                return h * 0.999

            out = jax.lax.fori_loop(0, iters, body, h_ref[:])
            o_ref[:] = out
        return kernel

    # Whole-batch buffers blow the 16 MB scoped-VMEM limit at b=768
    # (f32 pre+gh+h+out+temps ~ 17.8 MB), so grid over the batch in
    # 256-lane blocks; each block runs the full fori_loop, so total
    # work is unchanged and us/gate-eval stays comparable.
    bb = min(b, 256)
    assert b % bb == 0
    for arm in ("none", "gates_f32", "gates_bf16"):
        try:
            f = jax.jit(lambda p, g, h, arm=arm: pl.pallas_call(
                make(arm),
                out_shape=jax.ShapeDtypeStruct((H, b), jnp.float32),
                grid=(b // bb,),
                in_specs=[
                    pl.BlockSpec((3 * H, bb), lambda i: (0, i)),
                    pl.BlockSpec((3 * H, bb), lambda i: (0, i)),
                    pl.BlockSpec((H, bb), lambda i: (0, i)),
                ],
                out_specs=pl.BlockSpec((H, bb), lambda i: (0, i)),
            )(p, g, h))
            float(jnp.sum(f(pre0, gh0, h0)))
        except Exception as e:
            print(f"{arm}: COMPILE/RUN FAIL: {str(e)[-300:]}",
                  flush=True)
            continue
        times = []
        for _ in range(9):
            t0 = time.perf_counter()
            acc = jnp.sum(f(pre0, gh0, h0))
            for _ in range(3):
                acc = acc + jnp.sum(f(pre0, gh0, h0))
            float(acc)
            times.append((time.perf_counter() - t0) / 4)
        med = statistics.median(times) / iters * 1e6
        print(f"{arm:10s}: {med:.3f} us/gate-eval", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
