"""Training-throughput batch scaling (VERDICT r4 next #2).

Round 4's wide-batch lesson — the sampler step is dependency-latency-
bound, so batch width amortises the serial chain (47% -> 75% MFU from
b128 -> b768) — applied to the axis the reference actually spends its
compute on: 5000-epoch trainings (reference src/train_frame.py:199,
src/train.py).  BENCH_r04 timed both train steps at exactly one shape
(B=16, 90 frames: vocoder 1.9% MFU, predictor 0.1%) and never asked
where the other 98% goes.

This probe scales the production-shaped steps across batch at fixed
per-utterance length and reports steps/s, samples/s/chip, and MFU
(XLA's own cost analysis of each compiled step, like bench.py's train
section):

    python scripts/bench_train_scaling.py [vocoder_batches] [predictor_batches]

defaults: vocoder 16,32,64,128,256 / predictor 16,64,256,1024,4096.
Timing follows bench.py: CHAIN donated steps chained device-side per
rep, ONE scalar pull, median over REPS.
"""
import functools
import json
import statistics
import sys
import time

sys.path.insert(0, ".")

import numpy as np

PEAK_FLOPS = 197e12
REPS = 5
CHAIN = 4
F = 90          # frames per utterance (flagship chunks config)


def measure_vocoder(B, time_chunks: int = 0, bunch: int = 1):
    import jax
    import jax.numpy as jnp
    import optax

    from fpsc_tpu.models import lpcnet, lpcnet_bunched
    from fpsc_tpu.train.train_lpcnet import make_step

    rng = np.random.RandomState(1)
    if bunch == 1:
        cfg = lpcnet.LPCNetConfig()
        params = lpcnet.init_lpcnet(jax.random.PRNGKey(0), cfg)
        loss = None
    else:
        # the production recipe (validate_flagship / the A/B arms):
        # bunch=2, gru_b_units=32
        cfg = lpcnet.LPCNetConfig(gru_b_units=32)
        init = {2: lpcnet_bunched.init_bunched,
                4: lpcnet_bunched.init_bunched4}[bunch]
        params = init(jax.random.PRNGKey(0), cfg)
        loss = {2: lpcnet_bunched.loss_fn,
                4: lpcnet_bunched.loss_fn4}[bunch]
    tx = optax.adam(1e-4)
    opt = tx.init(params)
    feat = jnp.asarray(rng.randn(B, F, 20).astype(np.float32) * .3)
    periods = jnp.asarray(rng.randint(32, 256, (B, F)).astype(np.int32))
    x = jnp.asarray(rng.randn(B, F * 160).astype(np.float32) * .1)
    lpc = jnp.asarray(rng.randn(B, F, 16).astype(np.float32) * .05)
    step, _ = make_step(tx, loss_fn=loss, noise_levels=2,
                        time_chunks=time_chunks)
    key = jax.random.PRNGKey(2)
    return _timed(step, (params, opt), (feat, periods, x, lpc, key),
                  B * F * 160)


def measure_predictor(B):
    import jax
    import jax.numpy as jnp
    import optax

    from fpsc_tpu.models import frame_predictor as fp
    from fpsc_tpu.train.train_frame import warmup_loss

    rng = np.random.RandomState(1)
    params = fp.init_frame_predictor(jax.random.PRNGKey(0))
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def pstep(p, o, f):
        loss, grads = jax.value_and_grad(warmup_loss)(p, f)
        updates, o = tx.update(grads, o, p)
        import optax as _o
        return _o.apply_updates(p, updates), o, loss

    pf = jnp.asarray(rng.randn(B, F, 20).astype(np.float32) * .3)
    return _timed(pstep, (params, opt), (pf,), B * F)


def _timed(step_fn, state, args, samples_per_step):
    import jax
    params, opt = state
    flops = None
    try:
        an = step_fn.lower(params, opt, *args).compile()
        ca = an.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca["flops"])
    except Exception:
        pass
    params, opt, loss = step_fn(params, opt, *args)
    float(loss)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(CHAIN):
            params, opt, loss = step_fn(params, opt, *args)
        float(loss)
        times.append((time.perf_counter() - t0) / CHAIN)
    med = statistics.median(times)
    row = {"steps_per_s": round(1.0 / med, 2),
           "samples_per_s": round(samples_per_step / med),
           "spread_pct": round(100 * (max(times) - min(times)) / med, 1)}
    if flops:
        row["mfu_pct"] = round(100 * flops / med / PEAK_FLOPS, 2)
        row["step_flops"] = flops
    return row


def main():
    vb = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1
                           else "16,32,64,128,256").split(",") if x]
    pb = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2
                           else "16,64,256,1024,4096").split(",") if x]
    b2 = [int(x) for x in sys.argv[3].split(",") if x] \
        if len(sys.argv) > 3 else []
    out = {}

    def chunks_for(B, boundary):
        # one-shot forward crosses the 2 GiB activation boundary past
        # B=`boundary` at flagship T=14400 ((B, T, 3H) pre-activations;
        # the bunch=2 pair program halves the step count so the
        # boundary sits ~2x higher) — the chunked/rematerialised loss
        # (lpcnet._chunked_nll / lpcnet_bunched._chunked_nll2,
        # identical loss + grads) keeps every buffer bounded.  Chunk
        # count must divide the frame count (segment boundaries sit on
        # frame boundaries); sized to keep the per-segment buffer near
        # the largest one-shot size.
        if B <= boundary:
            return 0
        return next(d for d in (2, 3, 5, 6, 9, 10, 15, 18, 30, 45, 90)
                    if d >= B // boundary and F % d == 0)

    for B in vb:
        tc = chunks_for(B, 32)
        try:
            r = measure_vocoder(B, time_chunks=tc)
        except Exception as e:
            r = {"error": str(e)[:200]}
        if tc:
            r["time_chunks"] = tc
        out[f"vocoder_b{B}"] = r
        print(f"vocoder   B={B:5d}: {r}", flush=True)
    for B in b2:
        tc = chunks_for(B, 64)
        try:
            r = measure_vocoder(B, time_chunks=tc, bunch=2)
        except Exception as e:
            r = {"error": str(e)[:200]}
        if tc:
            r["time_chunks"] = tc
        out[f"vocoder_bunch2_b{B}"] = r
        print(f"vocoder2  B={B:5d}: {r}", flush=True)
    for B in pb:
        try:
            r = measure_predictor(B)
        except Exception as e:
            r = {"error": str(e)[:200]}
        out[f"predictor_b{B}"] = r
        print(f"predictor B={B:5d}: {r}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
