"""Offline codec encode: dump quantised feature files + rate report.

Capability parity with reference src/generate_qtz_features.py: run the
closed-loop encoder with real quantisers over the training set, write
per-utterance (n_chunks, 19, 36) coded-feature arrays (LPC recomputed
from CODED cepstra), accumulate codebook usage and print per-codebook
bit entropies (cal_entropy, :94-101,202).  Additionally packs a real
bitstream per utterance and reports the measured bitrate.

Run:  python -m fpsc_tpu.train.generate_qtz_features data.synthetic=true \
          codec.codebook_path=codebooks/default.npz
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fpsc_tpu.codec import bitstream as bs
from fpsc_tpu.codec import native_rc
from fpsc_tpu.codec.codec import coded_feature_windows, encode

# byte-identical native C++ entropy backend when it builds (parity
# pinned in tests/test_native_rc.py), pure-Python reference otherwise
rc = native_rc.best()
from fpsc_tpu.config.config import Config, parse_cli
from fpsc_tpu.data.dataset import build_dataset, predictor_inputs
from fpsc_tpu.dsp import constants as C
from fpsc_tpu.dsp.entropy import usage_entropy_bits
from fpsc_tpu.train import checkpoint as ckpt
from fpsc_tpu.train.train_frame import build_model


def codebook_sizes(codebooks) -> dict:
    return {
        "scl": int(codebooks.scl.shape[0]),
        "scl_bl": int(codebooks.scl_bl.shape[0])
        if codebooks.scl_bl is not None else 0,
        "vq": [int(cb.shape[0]) for cb in codebooks.vq],
        "vq_bl": [int(cb.shape[0]) for cb in codebooks.vq_bl]
        if codebooks.vq_bl is not None else [],
    }


def run(cfg: Config, max_utterances: int = 1000,
        out_dir: Optional[str] = None):
    params = build_model(cfg, jax.random.PRNGKey(cfg.train.seed))
    if cfg.train.transfer_model:
        payload = ckpt.load(ckpt.checkpoint_path(
            cfg.train.save_dir, cfg.train.transfer_model,
            cfg.train.transfer_epoch))
        params = ckpt.restore_params(params, payload, "predictor")
    codebooks = ckpt.load_codebooks(cfg.codec.codebook_path)
    sizes = codebook_sizes(codebooks)
    # value-rank permutations for the energy context buckets; derived
    # from the codebook artifacts so both codec sides agree
    orders = rc.scalar_orders(codebooks)

    out_dir = out_dir or os.path.join(cfg.train.save_dir,
                                      f"qtz_features_{cfg.label}")
    os.makedirs(os.path.join(out_dir, "train"), exist_ok=True)

    ds = build_dataset(cfg.data, "train")
    totals = None
    streams = []
    mse_sum, mse_n = 0.0, 0
    bits_total, bits_rc_total, frames_total = 0, 0, 0
    done = 0
    # quantize_pitch expects RAW-scale pitch features
    pitch_scale = C.MAXI if cfg.data.normalize else 1.0

    # head-aligned deterministic crops: the saved coded windows must
    # pair with the waveform HEAD for train_lpcnet.coded_dataset (the
    # reference pins a fixed dataset offset for the same reason,
    # dataset.py:64-66)
    for batch in ds.iter_batches(min(cfg.data.batch_size, len(ds)),
                                 seed=0, head=True):
        feat = jnp.asarray(predictor_inputs(batch, cfg.data.normalize))
        enc = encode(params, codebooks, feat,
                     use_mask=cfg.codec.use_mask,
                     scale=cfg.codec.mask_scale,
                     l1=cfg.codec.l1, l2=cfg.codec.l2)
        windows = coded_feature_windows(enc["coded"])
        coded = np.asarray(enc["coded"])
        orig = np.asarray(feat)
        mse_sum += float(np.mean((coded[..., :18] - orig[..., :18]) ** 2))
        mse_n += 1

        counts = [np.asarray(c) for c in enc["counts"]]
        totals = counts if totals is None else [
            a + b for a, b in zip(totals, counts)]

        for i, name in enumerate(batch["name"]):
            np.save(os.path.join(out_dir, "train", f"{name}.npy"),
                    windows[i])
            ind1_i = np.asarray(enc["ind1"])[i]
            ind2_i = np.asarray(enc["ind2"])[i]
            idx_i = {k: np.asarray(v)[i]
                     for k, v in enc["indices"].items()}
            pitch_raw = orig[i, :, 18:] * pitch_scale
            packed = bs.pack_utterance(ind1_i, ind2_i, idx_i,
                                       pitch_raw, sizes)
            packed_rc = rc.pack_utterance_rc(
                ind1_i, ind2_i, idx_i, bs.quantize_pitch(pitch_raw),
                sizes, orders=orders)
            bits_total += len(packed) * 8
            bits_rc_total += len(packed_rc) * 8
            frames_total += orig.shape[1]
            streams.append((ind1_i, ind2_i, idx_i,
                            bs.quantize_pitch(pitch_raw)))
            done += 1
        if cfg.train.debugging or done >= max_utterances:
            break

    entropies = [round(usage_entropy_bits(c), 3) for c in totals]
    bitrate = bits_total / frames_total * 100.0
    bitrate_rc = bits_rc_total / frames_total * 100.0
    # raw symbol streams for offline entropy-model iteration (rate
    # experiments re-pack these without re-running the encoder)
    dump = {"n_utterances": np.int64(len(streams))}
    for u, (i1, i2, ix, pc) in enumerate(streams):
        dump[f"u{u}_ind1"] = np.asarray(i1)
        dump[f"u{u}_ind2"] = np.asarray(i2)
        dump[f"u{u}_pcodes"] = np.asarray(pc)
        for k, v in ix.items():
            dump[f"u{u}_idx_{k}"] = np.asarray(v)
    np.savez(os.path.join(out_dir, "streams.npz"), **dump)
    # shared priors: training-set usage counts seeding the adaptive
    # entropy models (ride with the codebook artifacts; both codec
    # sides must hold the identical dict).  The re-packed rate below
    # is in-sample - the honest number is the held-out rate measured
    # by synthesis_qtz.run(priors=...).
    priors = rc.collect_priors(streams, sizes, orders=orders)
    bits_pri = sum(
        len(rc.pack_utterance_rc(i1, i2, ix, pc, sizes, priors=priors,
                                 orders=orders))
        * 8 for i1, i2, ix, pc in streams)
    bitrate_pri = bits_pri / frames_total * 100.0
    # attach the priors to the codebook artifacts: the file codec
    # (codec/cli.py) and any decoder-side process read them from there
    ckpt.save_priors(cfg.codec.codebook_path, priors)
    print(f"coded {done} utterances -> {out_dir}")
    print(f"codebook usage entropies (bits): {entropies}")
    print(f"coded-feature MSE (normalised): {mse_sum / mse_n:.6f}")
    print(f"measured bitrate: {bitrate:.1f} b/s fixed-layout, "
          f"{bitrate_rc:.1f} b/s entropy-coded, "
          f"{bitrate_pri:.1f} b/s with shared priors (in-sample)")
    return {"entropies": entropies, "bitrate": bitrate,
            "bitrate_rc": bitrate_rc, "bitrate_priors": bitrate_pri,
            "priors": priors, "orders": orders,
            "mse": mse_sum / mse_n, "out_dir": out_dir}


if __name__ == "__main__":
    run(parse_cli())
