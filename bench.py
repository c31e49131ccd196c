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

    # The timed quantity reduces the synthesised waveform to one scalar
    # ON DEVICE: pulling the scalar forces every sample to be computed
    # (the sum depends on all of them) without paying the development
    # tunnel's ~30 MB/s device->host bandwidth for the 8 MB waveform,
    # which otherwise dominates and is not part of the synthesis
    # metric.  (block_until_ready alone returns early on this backend.)
    gen = jax.jit(lambda p, f, pe, l, k: jnp.sum(
        pallas_generate(p, f, pe, l, k)))
    key = jax.random.PRNGKey(1)

    float(gen(params, feat, periods, lpc, key))  # compile + warm up
    times = []
    for i in range(7):
        t0 = time.perf_counter()
        float(gen(params, feat, periods, lpc, jax.random.PRNGKey(i)))
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
