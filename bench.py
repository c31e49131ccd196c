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
    def measure(p, pattern=None):
        gen = jax.jit(lambda p, f, pe, l, k: jnp.sum(
            pallas_generate(p, f, pe, l, k, gru_a_pattern=pattern)))
        float(gen(p, feat, periods, lpc,
                  jax.random.PRNGKey(1)))  # compile + warm up
        times = []
        for i in range(5):
            t0 = time.perf_counter()
            float(gen(p, feat, periods, lpc, jax.random.PRNGKey(i)))
            times.append(time.perf_counter() - t0)
        return batch * seconds / min(times)

    rtf_dense = measure(params)

    # production sparse model (LPCNet practice trains GRU_A's
    # recurrent matrix to ~0.2 block density with the cubic ramp -
    # lpcnet.sparsify_gru_a / train_lpcnet wiring, quality-verified in
    # scripts/validate_sparse.py); the kernel skips the dead (64, 64)
    # blocks of the recurrent matmul.
    from fpsc_tpu.ops.lpcnet_sampler import derive_block_pattern

    sparse_params = lpcnet.sparsify_gru_a(params, 0.2, block=(64, 64))
    pattern = derive_block_pattern(sparse_params.gru_a.wh, (64, 64))
    rtf_sparse = measure(sparse_params, pattern)

    # deployed default: bunched sampling (one recurrent step per
    # sample PAIR, models/lpcnet_bunched.py; quality-verified in
    # scripts/validate_bunched.py, whose validated config widens
    # GRU_B to 32) + sparse GRU_A.
    from fpsc_tpu.models import lpcnet_bunched

    bcfg = lpcnet.LPCNetConfig(gru_b_units=32)
    bparams = lpcnet_bunched.init_bunched(jax.random.PRNGKey(0), bcfg)
    bparams = lpcnet_bunched.sparsify_gru_a(bparams, 0.2,
                                            block=(64, 64))
    bpattern = derive_block_pattern(bparams.base.gru_a.wh, (64, 64))
    rtf_bunched = measure(bparams, bpattern)

    # bunch=4 (one recurrent step per FOUR samples): quality-verified
    # at GRU_B 64 with noise-injection training (Bark-LSD 0.600 vs
    # bunch=2's 0.589 under the same recipe — +0.010, scripts/
    # validate_bunch4_recovery.py), so it is part of the headline max
    # since round 3 (VALIDATION.md).
    b4cfg = lpcnet.LPCNetConfig(gru_b_units=64)
    b4params = lpcnet_bunched.init_bunched4(jax.random.PRNGKey(0),
                                            b4cfg)
    rtf_b4 = measure(b4params)

    # bunch=4 + sparse KERNEL path: quality-gated by the
    # b4gb64_noise_sparse arm of validate_bunch4_recovery (Bark-LSD
    # 0.567 sparse-trained vs 0.600 dense at 400 ep/96 utts — sparse
    # TRAINING is better, as for bunch=1/2).  Measured SLOWER than
    # the dense path at bunch=4 (the recurrent matmul is amortised
    # over 4 samples, so block bookkeeping outweighs the saved
    # FLOPs): deploy sparse-trained weights through the DENSE kernel
    # path (identical output — the pruned blocks are zeros).
    b4s = lpcnet_bunched.sparsify_gru_a4(b4params, 0.2, block=(64, 64))
    b4pattern = derive_block_pattern(b4s.base.gru_a.wh, (64, 64))
    rtf_b4_sparse = measure(b4s, b4pattern)

    # encoder-side RTF (closed-loop scan with in-scan m-best VQ over
    # the production 256+1024x2/16+512 books) — the chain is
    # vocoder-bound, so this is reported as an extra, not the headline
    from fpsc_tpu.codec.codec import encode
    from fpsc_tpu.models import frame_predictor as fp

    fparams = fp.init_frame_predictor(jax.random.PRNGKey(0))
    cbs = fp.Codebooks(
        scl=jnp.asarray(np.sort(rng.randn(256).astype(np.float32))),
        vq=(jnp.asarray(rng.randn(1024, 17).astype(np.float32) * .1),
            jnp.asarray(rng.randn(1024, 17).astype(np.float32) * .05)),
        scl_bl=jnp.asarray(np.sort(
            rng.randn(16).astype(np.float32) * .02)),
        vq_bl=(jnp.asarray(
            rng.randn(512, 17).astype(np.float32) * .02),),
    )
    enc_sum = jax.jit(lambda p, c, f: jnp.sum(encode(p, c, f)["coded"]))
    float(enc_sum(fparams, cbs, feat))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(enc_sum(fparams, cbs, feat))
        times.append(time.perf_counter() - t0)
    rtf_enc = batch * seconds / min(times)

    rtf = max(rtf_dense, rtf_sparse, rtf_bunched, rtf_b4,
              rtf_b4_sparse)
    print(json.dumps({
        "metric": "lpcnet_synthesis_aggregate_rtf",
        "value": round(rtf, 1),
        "unit": "x_realtime_per_chip_batch128",
        "vs_baseline": round(rtf / 500.0, 3),
        "dense_rtf": round(rtf_dense, 1),
        "sparse_rtf_d0.2": round(rtf_sparse, 1),
        "bunched_sparse_rtf": round(rtf_bunched, 1),
        "bunch4_rtf": round(rtf_b4, 1),
        "bunch4_sparse_rtf": round(rtf_b4_sparse, 1),
        "encode_rtf": round(rtf_enc, 1),
    }))


if __name__ == "__main__":
    main()
