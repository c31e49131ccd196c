"""Residual VQ / scalar codebook training entry point.

Capability parity with reference src/train_cb.py: synthesise
closed-loop prediction residuals with a trained predictor, split them
into above/below-threshold streams, then LBG-train the multi-stage VQ
books (batch 0 = full grow-by-one training, later batches = 10
refinement updates per stage, train_cb.py:193-211) and k-means the
scalar c0 books (the reference's commented sklearn KMeans block,
train_cb.py:219-226, implemented for real).

Unlike the reference - which needs separate runs for the above and
below books - one invocation trains all four/five books and saves a
single .npz bundle consumable by the codec.

Run:  python -m fpsc_tpu.train.train_cb data.synthetic=true \
          codec.vq_entries=64,64 codec.vq_entries_bl=32
"""
from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fpsc_tpu.config.config import Config, parse_cli
from fpsc_tpu.data.dataset import build_dataset, predictor_inputs
from fpsc_tpu.models import frame_predictor as fp
from fpsc_tpu.quant import lbg
from fpsc_tpu.train import checkpoint as ckpt
from fpsc_tpu.train.train_frame import build_model


def scalar_kmeans(data: np.ndarray, k: int, iters: int = 25) -> jnp.ndarray:
    """1-D k-means with quantile init (c0 scalar codebooks)."""
    data = np.asarray(data, np.float32).reshape(-1, 1)
    if data.shape[0] < k:
        pad = np.linspace(data.min() if data.size else -1.0,
                          data.max() if data.size else 1.0, k,
                          dtype=np.float32)[:, None]
        data = np.concatenate([data, pad], 0)
    qs = np.quantile(data[:, 0], np.linspace(0, 1, k)).astype(np.float32)
    cb = jnp.asarray(qs[:, None])
    d = jnp.asarray(data)
    for _ in range(iters):
        cb, counts = lbg.kmeans_update(d, cb, jnp.asarray(k))
        # re-seed empty clusters at the global mean to keep k live codes
        cb = jnp.where(counts[:, None] > 0, cb, jnp.mean(d))
    return cb[:, 0]


def synthesize_residuals(params, feat, l1, l2, use_mask=False, scale=1.0):
    """Closed-loop residual synthesis (no quantisation).

    Returns (r_above (N, 18), r_below (N, 18)) row-filtered to frames
    where the respective stream is live (reference train_cb.py:175-187
    filters zero rows host-side)."""
    if use_mask:
        out = fp.mask_enc(params, feat, scale=scale, qtz=False)
        r, r_bl = np.asarray(out["r"]), np.asarray(out["r_bl"])
    else:
        out = fp.encoder(params, feat, l1=l1, l2=l2, qtz=False)
        r, r_bl = np.asarray(out["r"]), np.asarray(out["r_under"])
    r = r.reshape(-1, r.shape[-1])
    r_bl = r_bl.reshape(-1, r_bl.shape[-1])
    return r, r_bl


def _vq_stream(rows: np.ndarray, code_dims: int) -> np.ndarray:
    v = rows[:, -code_dims:]
    keep = np.abs(v).sum(1) != 0
    return v[keep]


def _scl_stream(rows: np.ndarray) -> np.ndarray:
    v = rows[:, 0]
    return v[v != 0]


def run(cfg: Config) -> fp.Codebooks:
    params = build_model(cfg, jax.random.PRNGKey(cfg.train.seed))
    if cfg.train.transfer_model:
        path = ckpt.checkpoint_path(cfg.train.save_dir,
                                    cfg.train.transfer_model,
                                    cfg.train.transfer_epoch)
        payload = ckpt.load(path)
        params = ckpt.restore_params(params, payload, "predictor")
        print(f"Loaded predictor: {path}")

    ds = build_dataset(cfg.data, "train")
    l1, l2 = cfg.codec.l1, cfg.codec.l2
    code_dims = cfg.codec.code_dims

    books: Optional[List] = None
    books_bl: Optional[List] = None
    scl_vals: List[np.ndarray] = []
    scl_bl_vals: List[np.ndarray] = []

    for batch_idx, batch in enumerate(
            ds.iter_batches(cfg.data.batch_size, seed=cfg.train.seed)):
        feat = jnp.asarray(predictor_inputs(batch, cfg.data.normalize))
        t0 = time.time()
        # mask-path codebooks train on the LEARNED-mask residual split
        # (reference train_cb.py:170 runs mask_enc); the soft sigmoid
        # masks at the trained scale keep the split differentiable-
        # consistent with what mask_enc(qtz=True) hardens at encode
        r, r_bl = synthesize_residuals(
            params, feat, l1, l2, use_mask=cfg.codec.use_mask,
            scale=cfg.codec.mask_scale)
        scl_vals.append(_scl_stream(r))
        scl_bl_vals.append(_scl_stream(r_bl))
        v = _vq_stream(r, code_dims)
        v_bl = _vq_stream(r_bl, code_dims)
        print(f"batch {batch_idx}: residuals above={v.shape[0]} "
              f"below={v_bl.shape[0]} ({time.time() - t0:.1f}s)")

        if batch_idx == 0:
            books = lbg.train_multistage(v, cfg.codec.vq_entries,
                                         seed=cfg.train.seed)
            if cfg.codec.vq_entries_bl and v_bl.shape[0]:
                books_bl = lbg.train_multistage(
                    v_bl, cfg.codec.vq_entries_bl, seed=cfg.train.seed + 7)
        else:
            def refine(bs, data):
                rr = jnp.asarray(data)
                for i, cb in enumerate(bs):
                    for _ in range(10):
                        cb, _ = lbg.kmeans_update(rr, cb,
                                                  jnp.asarray(cb.shape[0]))
                    bs[i] = cb
                    qr = lbg.quantize(cb, rr)
                    rr = qr - rr
                return bs
            if v.shape[0]:
                books = refine(books, v)
            if books_bl is not None and v_bl.shape[0]:
                books_bl = refine(books_bl, v_bl)

        if cfg.train.debugging or batch_idx + 1 >= max(
                1, cfg.train.steps_per_epoch or 1):
            break

    scl_cb = scalar_kmeans(np.concatenate(scl_vals), cfg.codec.scl_entries)
    scl_bl_cb = None
    if cfg.codec.scl_entries_bl:
        vals = np.concatenate(scl_bl_vals) if scl_bl_vals else np.zeros(1)
        scl_bl_cb = scalar_kmeans(vals, cfg.codec.scl_entries_bl)

    codebooks = fp.Codebooks(
        scl=scl_cb, vq=tuple(books),
        scl_bl=scl_bl_cb,
        vq_bl=tuple(books_bl) if books_bl is not None else None)
    ckpt.save_codebooks(cfg.codec.codebook_path, codebooks)
    print(f"saved codebooks -> {cfg.codec.codebook_path}")
    return codebooks


if __name__ == "__main__":
    run(parse_cli())
