"""Root-cause probe for BENCH_r04's bunch4_int8 21% spread (VERDICT
r4 weak #1): every other row sat at 0.6-3.0% and this one was never
looked at.

Reproduces the bench's exact variant order (bunch4 bf16 at b128, then
the int8 twin) and prints EVERY rep's wall time with a timestamp, so
the outlier's position identifies the mechanism:

  * rep 0 slow only            -> allocator/first-dispatch effect the
                                  untimed warm-up chain should absorb
  * one random rep slow        -> host contention / tunnel hiccup
  * a step change mid-run      -> recompile or clock throttle

    python scripts/probe_int8_spread.py [reps]
"""
import statistics
import sys
import time

sys.path.insert(0, ".")

import numpy as np

CHAIN = 4


def run_variant(label, params, pattern, int8, reps, b=128, frames=100):
    import jax
    import jax.numpy as jnp

    from fpsc_tpu.ops.lpcnet_sampler import pallas_generate

    r = np.random.RandomState(b)
    feat = jnp.asarray(r.randn(b, frames, 20).astype(np.float32) * .3)
    periods = jnp.asarray(r.randint(32, 256, (b, frames))
                          .astype(np.int32))
    lpc = jnp.asarray(r.randn(b, frames, 16).astype(np.float32) * .05)
    gen = jax.jit(lambda p, f, pe, l, k: jnp.sum(
        pallas_generate(p, f, pe, l, k, gru_a_pattern=pattern,
                        weights_int8=int8)))
    float(gen(params, feat, periods, lpc, jax.random.PRNGKey(1)))
    acc = gen(params, feat, periods, lpc, jax.random.PRNGKey(2))
    for _ in range(1, CHAIN):
        acc = acc + gen(params, feat, periods, lpc, jax.random.PRNGKey(2))
    float(acc)
    times = []
    t_start = time.perf_counter()
    for i in range(reps):
        t0 = time.perf_counter()
        acc = gen(params, feat, periods, lpc,
                  jax.random.PRNGKey(i * CHAIN))
        for j in range(1, CHAIN):
            acc = acc + gen(params, feat, periods, lpc,
                            jax.random.PRNGKey(i * CHAIN + j))
        float(acc)
        dt = (time.perf_counter() - t0) / CHAIN
        times.append(dt)
        print(f"  {label} rep {i:2d} @t+{t0 - t_start:7.2f}s: "
              f"{dt * 1e3:7.2f} ms", flush=True)
    med = statistics.median(times)
    print(f"{label}: median {med * 1e3:.2f} ms, spread "
          f"{100 * (max(times) - min(times)) / med:.1f}%, "
          f"max/med {max(times) / med:.2f}, "
          f"argmax rep {int(np.argmax(times))}", flush=True)
    return times


def main(reps: int = 25):
    import jax

    from fpsc_tpu.models import lpcnet, lpcnet_bunched

    b4cfg = lpcnet.LPCNetConfig(gru_b_units=64)
    b4params = lpcnet_bunched.init_bunched4(jax.random.PRNGKey(0),
                                            b4cfg)
    run_variant("bunch4      ", b4params, None, False, reps)
    run_variant("bunch4_int8 ", b4params, None, True, reps)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 25)
