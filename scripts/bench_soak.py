"""Sustained-load serving soak: the fused full-duplex tick under
minutes of continuous traffic, with jitter statistics.

Every serving number so far is a short-run median (bench_streaming's
device-resident rows chain K=200 ticks once).  A production serving
claim also needs SUSTAINED behaviour: does the 512-stream tick hold
its latency over thousands of consecutive ticks (clock drift, queue
buildup, allocator creep), and how tight is the distribution?

Method (CLAUDE.md env rule 2): per-tick host timestamps would pay a
~35 ms tunnel RTT each, so ticks are chained device-side in GROUPS of
`group` ticks with ONE scalar pull per group — the measured unit is
ms/tick averaged over a group, and the distribution is over groups
(jitter at `group`-tick granularity; group=50 = 0.5 s of audio).
The states thread through the whole soak, so this is one continuous
session, not repeated fresh starts.

    python scripts/bench_soak.py [batch] [n_ticks] [group]

Defaults: 512 streams, 3000 ticks (30 s of audio per stream,
~15.4 M stream-frames), group 50.  Reports per-group ms/tick
min/p50/p90/p99/max, first-vs-last-decile drift, deadline analysis
vs the 10 ms tick budget, and aggregate stream-frames/s.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(batch: int = 512, n_ticks: int = 3000, group: int = 50):
    import jax
    import jax.numpy as jnp

    from fpsc_tpu.codec.streaming import StreamingCodec
    from fpsc_tpu.models import frame_predictor as fp
    from fpsc_tpu.models import lpcnet

    rng = np.random.RandomState(0)
    fp_params = fp.init_frame_predictor(jax.random.PRNGKey(0))
    cbs = fp.Codebooks(
        scl=jnp.asarray(np.sort(rng.randn(256).astype(np.float32) * .1)),
        vq=(jnp.asarray(rng.randn(1024, 17).astype(np.float32) * .1),
            jnp.asarray(rng.randn(1024, 17).astype(np.float32) * .05)),
        scl_bl=jnp.asarray(
            np.sort(rng.randn(16).astype(np.float32) * .02)),
        vq_bl=(jnp.asarray(rng.randn(512, 17).astype(np.float32) * .02),),
    )
    voc_params = lpcnet.init_lpcnet(jax.random.PRNGKey(1))
    codec = StreamingCodec(fp_params, cbs, voc_params, batch=batch)

    # a rotating buffer of feature rows so consecutive ticks see
    # different (but pre-staged, device-resident) inputs
    n_rows = 97                                    # coprime with group
    feats = jnp.asarray(
        (rng.randn(n_rows, batch, 20) * 0.3).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(5), n_rows)

    es, ds, vs = codec.enc_state, codec.dec_state, codec.voc_state
    es, ds, vs, y = codec._tick(es, ds, vs, keys[0], feats[0])
    float(jnp.sum(y))                              # compile + warm
    n_groups = n_ticks // group
    per_group_ms = []
    t_start = time.perf_counter()
    tick = 0
    for g in range(n_groups):
        t0 = time.perf_counter()
        for _ in range(group):
            i = tick % n_rows
            es, ds, vs, y = codec._tick(es, ds, vs, keys[i], feats[i])
            tick += 1
        float(jnp.sum(y))                          # one pull per group
        per_group_ms.append(
            (time.perf_counter() - t0) / group * 1e3)
    wall = time.perf_counter() - t_start

    ms = np.asarray(per_group_ms)
    dec = max(1, len(ms) // 10)
    drift = (ms[-dec:].mean() - ms[:dec].mean()) / ms[:dec].mean()
    agg = batch * 0.010 / (ms.mean() / 1e3)        # x real time
    print(f"soak: {batch} duplex streams x {tick} ticks "
          f"({tick * 0.010:.0f} s of audio/stream, "
          f"{batch * tick / 1e6:.1f}M stream-frames) in {wall:.1f} s")
    print(f"per-tick ms over {len(ms)} groups of {group}: "
          f"min {ms.min():.2f}  p50 {np.percentile(ms, 50):.2f}  "
          f"p90 {np.percentile(ms, 90):.2f}  "
          f"p99 {np.percentile(ms, 99):.2f}  max {ms.max():.2f}")
    print(f"first-vs-last-decile drift {drift * 100:+.1f}%  "
          f"(negative/zero = no degradation)")
    over = int((ms > 10.0).sum())
    print(f"groups over the 10 ms/tick budget: {over}/{len(ms)}; "
          f"aggregate {agg:.0f}x real time "
          f"({batch * tick / wall / 1e3:.0f}k stream-frames/s)")
    return ms


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:4]]
    main(*a)
