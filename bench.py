"""Headline benchmark: batched LPCNet synthesis aggregate real-time
factor per chip (BASELINE.md north star: >500x at batch 128 on v5e).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is the ratio against the 500x-real-time target.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fpsc_tpu.dsp import constants as C
    from fpsc_tpu.models import lpcnet

    batch = 128
    frames = 100  # 1 s of audio per utterance
    seconds = frames * C.FRAME_SIZE / C.SAMPLE_RATE

    from fpsc_tpu.ops.lpcnet_sampler import pallas_generate

    cfg = lpcnet.LPCNetConfig()  # production sizes: GRU_A 384, GRU_B 16
    params = lpcnet.init_lpcnet(jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(batch, frames, 20).astype(np.float32) * 0.3)
    periods = jnp.asarray(
        rng.randint(32, 256, (batch, frames)).astype(np.int32))
    lpc = jnp.asarray(
        rng.randn(batch, frames, 16).astype(np.float32) * 0.05)

    gen = jax.jit(pallas_generate)
    key = jax.random.PRNGKey(1)

    # compile + warm up.  NOTE: timing forces a host transfer
    # (np.asarray); on the axon-tunneled backend block_until_ready
    # returns before device work completes.
    np.asarray(gen(params, feat, periods, lpc, key))
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        np.asarray(gen(params, feat, periods, lpc, jax.random.PRNGKey(i)))
        times.append(time.perf_counter() - t0)
    wall = min(times)
    rtf = batch * seconds / wall

    print(json.dumps({
        "metric": "lpcnet_synthesis_aggregate_rtf",
        "value": round(rtf, 1),
        "unit": "x_realtime_per_chip_batch128",
        "vs_baseline": round(rtf / 500.0, 3),
    }))


if __name__ == "__main__":
    main()
