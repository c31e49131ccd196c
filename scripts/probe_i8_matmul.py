"""Mosaic acceptance + speed probe: true i8 x i8 -> i32 matmuls.

ROADMAP #2's remaining headroom note: the int8 weight-only path
(ops/lpcnet_sampler.py) converts i8 weights UP to bf16 and runs bf16
MXU passes; quantising the ACTIVATIONS too would run genuine int8 MXU
passes (2x the bf16 peak on v5e) — IF Mosaic accepts (a) f32 -> i8
convert inside the kernel and (b) an i8 x i8 dot with i32 accumulation.
Earlier rounds' probes found vector<i8> ELEMENTWISE ops rejected; this
probe isolates exactly the two ops the sampler would need, at the
sampler's own GRU_A geometry, and times them against the bf16 twin.

    python scripts/probe_i8_matmul.py [m] [k] [b]

Prints one line per arm: compile ok/fail + median us over 50 chained
iterations (RTT-amortised, one scalar pull).
"""
import statistics
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(m=1152, k=384, b=128):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ITERS = 64

    def bf16_kernel(w_ref, x_ref, o_ref):
        def body(i, acc):
            y = jnp.dot(w_ref[:], acc,
                        preferred_element_type=jnp.float32)
            return y[:k].astype(jnp.bfloat16)
        x = jax.lax.fori_loop(0, ITERS, body,
                              x_ref[:].astype(jnp.bfloat16))
        o_ref[:] = x.astype(jnp.float32)

    def i8_kernel(w_ref, x_ref, o_ref):
        # w arrives i8; activations quantise f32 -> i8 in-kernel each
        # iteration (the convert is the op under test), matmul
        # accumulates i32.
        def body(i, acc):
            xq = jnp.clip(jnp.round(acc * 127.0), -127, 127
                          ).astype(jnp.int8)
            y = jnp.dot(w_ref[:], xq,
                        preferred_element_type=jnp.int32)
            return (y[:k].astype(jnp.float32)
                    * (1.0 / (127.0 * 127.0)))
        x = jax.lax.fori_loop(0, ITERS, body, x_ref[:])
        o_ref[:] = x

    rng = np.random.RandomState(0)
    w_f = jnp.asarray(rng.randn(m, k).astype(np.float32) * 0.05)
    x_f = jnp.asarray(rng.randn(k, b).astype(np.float32) * 0.5)

    def run(name, kernel, w):
        try:
            f = jax.jit(lambda w, x: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((k, b), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(w, x))
            float(jnp.sum(f(w, x_f)))
        except Exception as e:
            print(f"{name}: COMPILE/RUN FAIL: {str(e)[-400:]}",
                  flush=True)
            return
        times = []
        for i in range(9):
            t0 = time.perf_counter()
            acc = jnp.sum(f(w, x_f))
            for _ in range(3):
                acc = acc + jnp.sum(f(w, x_f))
            float(acc)
            times.append((time.perf_counter() - t0) / 4)
        med = statistics.median(times)
        per_mm = med / ITERS * 1e6
        flops = 2 * m * k * b
        print(f"{name}: ok, {per_mm:.2f} us/matmul "
              f"({flops / (per_mm * 1e-6) / 1e12:.1f} Tops/s)",
              flush=True)

    def onehot_i8_kernel(w_ref, x_ref, o_ref):
        # the sampler's embedding-gather shape: build a one-hot as i8
        # (comparison -> i8 convert, EXACT integer activation) and hit
        # the i8 table with it.  If this compiles+wins, the sampler's
        # embedding path (60% of bunch4 MXU FLOPs) can ride the 2x i8
        # MXU rate with zero activation-quantisation error.
        iota = jax.lax.broadcasted_iota(jnp.int32, (256, b), 0)
        def body(i, acc):
            idx = jnp.clip(jnp.sum(acc[:1], axis=0, keepdims=True),
                           0, 255).astype(jnp.int32)
            oh = (iota == idx).astype(jnp.int8)          # (256, B) i8
            y = jnp.dot(w_ref[:], oh,
                        preferred_element_type=jnp.int32)  # (m, B)
            return y[:k].astype(jnp.float32) * 1e-4
        x = jax.lax.fori_loop(0, ITERS, body, x_ref[:])
        o_ref[:] = x

    run("bf16", bf16_kernel, w_f.astype(jnp.bfloat16))
    wq = jnp.clip(jnp.round(w_f / jnp.max(jnp.abs(w_f)) * 127),
                  -127, 127).astype(jnp.int8)
    run("i8xi8->i32", i8_kernel, wq)

    w_emb = jnp.asarray(
        rng.randint(-127, 128, (m, 256)).astype(np.int8))
    def run_emb():
        try:
            f = jax.jit(lambda w, x: pl.pallas_call(
                onehot_i8_kernel,
                out_shape=jax.ShapeDtypeStruct((k, b), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(w, x))
            float(jnp.sum(f(w_emb, x_f)))
        except Exception as e:
            print(f"onehot_i8: COMPILE/RUN FAIL: {str(e)[-400:]}",
                  flush=True)
            return
        times = []
        for i in range(9):
            t0 = time.perf_counter()
            acc = jnp.sum(f(w_emb, x_f))
            for _ in range(3):
                acc = acc + jnp.sum(f(w_emb, x_f))
            float(acc)
            times.append((time.perf_counter() - t0) / 4)
        med = statistics.median(times) / ITERS * 1e6
        print(f"onehot_i8: ok, {med:.2f} us/gather-matmul "
              f"({2 * m * 256 * b / (med * 1e-6) / 1e12:.1f} Tops/s)",
              flush=True)
    run_emb()


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:4]))
