"""Where does the wide-batch sampling tail spend its time?

VALIDATION.md's speed-of-light note attributes the ~30% gap between
the bunch4 b768 headline (5456x, 70% MFU) and the 7778x analytic MXU
ceiling to the VPU sampling tail (per head: 2x tanh + exp + 8-pass
log-step roll cumsum + compare + mu-law decode reduction), the
per-row wide stores, and the conditioning network.  This probe
isolates the draw() tail from ops/lpcnet_sampler.py at the headline
geometry (256 levels x batch 768) and times ablations, each a
serially-chained fori_loop so nothing dead-code-eliminates:

  full      exact copy of the production draw
  no_cumsum 8-pass roll cumsum replaced by identity
  no_exp    exp replaced by an affine re-scale
  no_decode compare + u2l reduction replaced by one row-sum
  no_tanh   the two head tanh passes replaced by scales
  empty     loop body = one add (measures loop/carry overhead)

(A two-level/hierarchical cumsum was considered and rejected on
paper: building the full-resolution exclusive block prefix needs the
same or more (256, B) passes than the 8-pass log-step scan, which is
already work-optimal for an all-rows prefix.)

    python scripts/probe_draw_tail.py [b] [iters]

One line per arm: median us/draw over 9 reps (RTT-amortised, one
scalar pull per rep).  Compare against the measured chain-step cost
(~35 us per 4-sample step at b768) to size the optimisation headroom.
"""
import statistics
import sys
import time

sys.path.insert(0, ".")

import numpy as np

LEVELS = 256


def main(b=768, iters=64):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    logits0 = jnp.asarray(rng.randn(LEVELS, b).astype(np.float32) * .5)
    u2l = jnp.asarray(rng.randn(LEVELS, b).astype(np.float32) * 1e-3)
    us = jnp.asarray(rng.rand(1, b).astype(np.float32))

    def make(arm):
        def kernel(lg_ref, u2l_ref, u_ref, o_ref):
            iota_lvl = jax.lax.broadcasted_iota(
                jnp.int32, (LEVELS, b), 0)
            u_t = u_ref[:]
            if arm.startswith("tri_"):
                # lower-triangular ones: cdf = TRI @ pcut rides the
                # MXU, which sits idle during the serial sampling
                # tail anyway
                r = jax.lax.broadcasted_iota(
                    jnp.int32, (LEVELS, LEVELS), 0)
                c = jax.lax.broadcasted_iota(
                    jnp.int32, (LEVELS, LEVELS), 1)
                tri = (r >= c).astype(
                    jnp.bfloat16 if arm == "tri_bf16" else jnp.float32)

            def draw(fcpre):
                if arm == "no_tanh":
                    logits = fcpre[:LEVELS] * 0.3 + fcpre[:LEVELS] * 0.2
                else:
                    logits = (jnp.tanh(fcpre[:LEVELS])
                              + jnp.tanh(fcpre[:LEVELS]))
                if arm == "no_exp":
                    p = logits * 0.125 + 2.0
                else:
                    p = jnp.exp(logits * 0.1)
                z = jnp.sum(p, axis=0, keepdims=True)
                pcut = jnp.maximum(p - 0.002 * z, 0.0)
                cdf = pcut
                if arm == "no_cumsum":
                    pass
                elif arm == "tri_bf16":
                    cdf = jnp.dot(tri, pcut.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)
                elif arm == "tri_f32":
                    cdf = jnp.dot(tri, pcut,
                                  preferred_element_type=jnp.float32)
                else:
                    k = 1
                    while k < LEVELS:
                        cdf = cdf + jnp.where(
                            iota_lvl >= k,
                            pltpu.roll(cdf, k, 0), 0.0)
                        k *= 2
                total = cdf[LEVELS - 1:LEVELS]
                thresh = u_t * total
                if arm == "no_decode":
                    return jnp.sum(cdf[:1] - thresh, axis=0,
                                   keepdims=True)
                below = (cdf < thresh).astype(jnp.float32)
                return jnp.sum(below * u2l_ref[:], axis=0,
                               keepdims=True)

            def body(i, fcpre):
                if arm == "empty":
                    return fcpre + 1e-6
                e = draw(fcpre)
                return fcpre + e * 1e-3

            out = jax.lax.fori_loop(0, iters, body, lg_ref[:])
            o_ref[:] = out
        return kernel

    for arm in ("empty", "full", "no_cumsum", "no_exp", "no_decode",
                "no_tanh", "tri_bf16", "tri_f32"):
        try:
            f = jax.jit(lambda lg, w, u, arm=arm: pl.pallas_call(
                make(arm),
                out_shape=jax.ShapeDtypeStruct((LEVELS, b),
                                               jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(lg, w, u))
            float(jnp.sum(f(logits0, u2l, us)))
        except Exception as e:
            print(f"{arm}: COMPILE/RUN FAIL: {str(e)[-300:]}",
                  flush=True)
            continue
        times = []
        for _ in range(9):
            t0 = time.perf_counter()
            acc = jnp.sum(f(logits0, u2l, us))
            for _ in range(3):
                acc = acc + jnp.sum(f(logits0, u2l, us))
            float(acc)
            times.append((time.perf_counter() - t0) / 4)
        med = statistics.median(times) / iters * 1e6
        print(f"{arm:10s}: {med:.2f} us/draw", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
