"""Batch-scaling study of the fused sampler: aggregate RTF vs batch.

The bench.py headline is pinned at batch 128 (one 128-wide lane tile,
the BASELINE.md definition).  This probe asks whether a serving
deployment should run WIDER batches per chip: the sampler step is
dependency-latency-bound (ops/lpcnet_sampler.py header), so doubling
the batch grows every matmul's columns without lengthening the serial
chain — aggregate samples/s/chip should rise until the MXU or VMEM
saturates.

    python scripts/bench_batch_scaling.py [paths] [batches]

paths: comma list from {dense,sparse,bunch2_sparse,bunch4,
       bunch4_sparse,bunch4_int8} (default bunch4,bunch2_sparse).
       bunch4_sparse matters at WIDE batch: the sparse kernel loses
       to dense at b128 (latency-bound — skipping blocks doesn't
       shorten the serial chain) but the wide-batch regime is
       MXU-bound, where dropping 80% of the recurrent FLOPs pays.
batches: comma list (default 32,64,128,256,512)

Timing follows bench.py: CHAIN dispatches chained device-side per rep
(async scalar adds), ONE scalar pull per rep, median over REPS reps.
"""
import json
import statistics
import sys
import time

sys.path.insert(0, ".")

import numpy as np

REPS = 7
CHAIN = 4


def measure(batch: int, path: str):
    import jax
    import jax.numpy as jnp

    from fpsc_tpu.dsp import constants as C
    from fpsc_tpu.models import lpcnet, lpcnet_bunched
    from fpsc_tpu.ops.lpcnet_sampler import (derive_block_pattern,
                                             pallas_generate)

    frames = 100
    seconds = frames * C.FRAME_SIZE / C.SAMPLE_RATE
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(batch, frames, 20).astype(np.float32) * .3)
    periods = jnp.asarray(
        rng.randint(32, 256, (batch, frames)).astype(np.int32))
    lpc = jnp.asarray(rng.randn(batch, frames, 16).astype(np.float32) * .05)

    pattern, int8 = None, False
    if path == "dense":
        params = lpcnet.init_lpcnet(jax.random.PRNGKey(0),
                                    lpcnet.LPCNetConfig())
    elif path == "sparse":
        params = lpcnet.sparsify_gru_a(
            lpcnet.init_lpcnet(jax.random.PRNGKey(0),
                               lpcnet.LPCNetConfig()), 0.2, block=(64, 64))
        pattern = derive_block_pattern(params.gru_a.wh, (64, 64))
    elif path == "bunch2_sparse":
        params = lpcnet_bunched.sparsify_gru_a(
            lpcnet_bunched.init_bunched(
                jax.random.PRNGKey(0),
                lpcnet.LPCNetConfig(gru_b_units=32)), 0.2, block=(64, 64))
        pattern = derive_block_pattern(params.base.gru_a.wh, (64, 64))
    elif path in ("bunch4", "bunch4_sparse", "bunch4_int8"):
        params = lpcnet_bunched.init_bunched4(
            jax.random.PRNGKey(0), lpcnet.LPCNetConfig(gru_b_units=64))
        int8 = path.endswith("int8")
        if path == "bunch4_sparse":
            params = lpcnet_bunched.sparsify_gru_a4(params, 0.2,
                                                    block=(64, 64))
            pattern = derive_block_pattern(params.base.gru_a.wh,
                                           (64, 64))
    else:
        raise SystemExit(f"unknown path {path}")

    gen = jax.jit(lambda p, f, pe, l, k: jnp.sum(
        pallas_generate(p, f, pe, l, k, gru_a_pattern=pattern,
                        weights_int8=int8)))
    float(gen(params, feat, periods, lpc, jax.random.PRNGKey(1)))
    acc = gen(params, feat, periods, lpc, jax.random.PRNGKey(2))
    for _ in range(1, CHAIN):
        acc = acc + gen(params, feat, periods, lpc, jax.random.PRNGKey(2))
    float(acc)
    times = []
    for i in range(REPS):
        t0 = time.perf_counter()
        acc = gen(params, feat, periods, lpc, jax.random.PRNGKey(i))
        for j in range(1, CHAIN):
            acc = acc + gen(params, feat, periods, lpc,
                            jax.random.PRNGKey(i * CHAIN + j))
        float(acc)
        times.append((time.perf_counter() - t0) / CHAIN)
    med = statistics.median(times)
    return {"rtf": round(batch * seconds / med, 1),
            "ms_per_utt_s": round(1000 * med, 2),
            "spread_pct": round(100 * (max(times) - min(times)) / med, 1)}


def main():
    paths = (sys.argv[1] if len(sys.argv) > 1
             else "bunch4,bunch2_sparse").split(",")
    batches = [int(x) for x in (
        sys.argv[2] if len(sys.argv) > 2 else "32,64,128,256,512"
    ).split(",")]
    out = {}
    for path in paths:
        for batch in batches:
            try:
                r = measure(batch, path)
            except Exception as e:  # OOM / compile failure: record it
                r = {"error": str(e)[:200]}
            out[f"{path}_b{batch}"] = r
            print(f"{path:>14} batch {batch:>4}: {r}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
