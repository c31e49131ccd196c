"""Offline entropy-model lab: re-pack saved encode symbol streams.

Loads the `streams.npz` dumped by train/generate_qtz_features.run plus
the codebook archive (for scalar value orders), re-packs every
utterance with the current range-coder models, verifies the decode
roundtrip, and reports b/s three ways: adaptive-only, shared priors
in-sample, and leave-one-out priors (the honest held-out flavour).

    python scripts/rc_rate_lab.py [streams.npz] [cb.npz]
"""
import os
import sys

sys.path.insert(0, ".")

# pure host-side numpy work: never claim the TPU (env rule 1)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from fpsc_tpu.codec import range_coder as rc
from fpsc_tpu.train.generate_qtz_features import codebook_sizes
from fpsc_tpu.train import checkpoint as ckpt


def load_streams(path):
    z = np.load(path)
    out = []
    for u in range(int(z["n_utterances"])):
        idx = {k[len(f"u{u}_idx_"):]: z[k] for k in z.files
               if k.startswith(f"u{u}_idx_")}
        out.append((z[f"u{u}_ind1"], z[f"u{u}_ind2"], idx,
                    z[f"u{u}_pcodes"]))
    return out


def rate(streams, sizes, orders, priors_mode):
    bits = frames = 0
    trips = streams
    full = rc.collect_priors(trips, sizes, orders=orders)
    for u, (i1, i2, ix, pc) in enumerate(streams):
        if priors_mode == "none":
            pri = None
        elif priors_mode == "in-sample":
            pri = full
        else:  # leave-one-out
            pri = rc.collect_priors(trips[:u] + trips[u + 1:], sizes,
                                    orders=orders)
        data = rc.pack_utterance_rc(i1, i2, ix, pc, sizes, priors=pri,
                                    orders=orders)
        got = rc.unpack_utterance_rc(data, sizes, priors=pri,
                                     orders=orders)
        assert np.array_equal(got["ind1"], np.asarray(i1).astype(bool))
        assert np.array_equal(got["ind2"], np.asarray(i2).astype(bool))
        for k in ("scl", "scl_bl", "vq", "vq_bl"):
            want = np.atleast_2d(np.asarray(ix[k])) if k.startswith(
                "vq") else np.asarray(ix[k])
            have = got["indices"][k]
            mask = want >= 0
            assert np.array_equal(np.asarray(have)[mask], want[mask]), k
        bits += len(data) * 8
        frames += len(np.asarray(i1))
    return bits / frames * 100.0


def main(streams_path="/tmp/rc_lab/qtz/streams.npz",
         cb_path="/tmp/fpsc_flagship/cb.npz"):
    streams = load_streams(streams_path)
    codebooks = ckpt.load_codebooks(cb_path)
    sizes = codebook_sizes(codebooks)
    orders = rc.scalar_orders(codebooks)
    print(f"{len(streams)} utterances, sizes {sizes}")
    for omode, o in (("no-orders", None), ("value-orders", orders)):
        for pmode in ("none", "in-sample", "loo"):
            print(f"  {omode:12s} priors={pmode:9s} "
                  f"{rate(streams, sizes, o, pmode):7.1f} b/s",
                  flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
