"""Production-size LBG codebook-training wall time on the real TPU.

Reproduces the reference train_cb geometry (train_cb.py:123: batch 5000
x 10-chunk closed-loop residual pass; books 1024+1024 above-threshold /
512 below, README:26-29) and times:

  * the fused on-device LBG grow loop per stage (vq_train fast path),
  * one production-size kmeans update (refinement step),
  * the full multistage chain,
  * the reference's own numpy trainer on the same data (for scale).

    python scripts/bench_lbg.py [n_vectors]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(n: int = 5000):
    import jax
    import jax.numpy as jnp

    from fpsc_tpu.quant import lbg

    rng = np.random.RandomState(0)
    data = (rng.randn(n, 17) * 0.4).astype(np.float32)
    jdata = jnp.asarray(data)

    # fused grow loop, production stage sizes
    for entries in (1024, 512):
        t0 = time.time()
        cb = lbg.vq_train(jdata, entries, seed=0)
        _ = float(jnp.sum(cb))          # force completion (tunnel-safe)
        t_compile = time.time() - t0
        t0 = time.time()
        cb = lbg.vq_train(jdata, entries, seed=1)
        _ = float(jnp.sum(cb))
        t_steady = time.time() - t0
        print(f"vq_train fused: {entries:5d} entries, N={n}: "
              f"{t_steady:.2f} s steady ({t_compile:.1f} s w/ compile)",
              flush=True)

    # one refinement update at production size
    cb = lbg.vq_train(jdata, 1024, seed=0)
    t0 = time.time()
    for _ in range(10):
        cb, _c = lbg.kmeans_update(jdata, cb, jnp.asarray(1024))
    _ = float(jnp.sum(cb))
    print(f"10x kmeans_update (5000x1024): {time.time() - t0:.3f} s",
          flush=True)

    # full production chain
    t0 = time.time()
    books = lbg.train_multistage(jdata, [1024, 1024], seed=0)
    _ = float(jnp.sum(books[-1]))
    print(f"train_multistage [1024,1024]: {time.time() - t0:.2f} s",
          flush=True)

    # the reference's own numpy trainer for scale - at 256 entries
    # only: its find_nearest materialises (E, N, 17) float64
    # temporaries, so the full 1024-entry run takes tens of minutes
    # (the quadratic-in-E growth makes the scaling explicit below)
    sys.path.insert(0, "tests")
    from test_reference_parity import _load_reference_module
    ref_cb = _load_reference_module("cb_func", "quantization/cb_func.py")
    import io
    from contextlib import redirect_stdout
    np.random.seed(0)
    t0 = time.time()
    with redirect_stdout(io.StringIO()):
        ref_cb.vq_train(data[:n], np.zeros((256, 17)), 256)
    t_ref = time.time() - t0
    print(f"reference numpy vq_train 256: {t_ref:.1f} s "
          f"(grow loop is O(E^2): ~{t_ref * 16:.0f} s extrapolated at "
          f"1024)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5000)
