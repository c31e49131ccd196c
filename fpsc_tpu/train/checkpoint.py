"""Checkpointing + run logging.

Improves on the reference's epoch .pth dumps (reference:
src/utils.py:127-157, which saves model state only - resume restarts
Adam from scratch): here a checkpoint stores params + optimizer state
+ step as one pickled numpy pytree.  The per-epoch results text file
keeps the reference's line format for parity tooling.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np


def _to_numpy(tree):
    # one device_get for the whole tree: per-leaf np.asarray costs a
    # full host round trip each on the tunneled backend
    return jax.tree_util.tree_map(np.asarray, jax.device_get(tree))


def save(path: str, params: Any, opt_state: Any = None, step: int = 0,
         extra: Optional[dict] = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"params": _to_numpy(params),
               "opt_state": _to_numpy(opt_state) if opt_state is not None
               else None,
               "step": int(step), "extra": extra or {}}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load(path: str):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return payload


def checkpoint_path(save_dir: str, label: str, epoch) -> str:
    return os.path.join(save_dir, label, f"{label}_{epoch}.ckpt")


def restore_params(template: Any, payload: Any, what: str = "model"):
    """Rebuild a params pytree from a checkpoint payload, validated.

    Replaces the blind tree_unflatten at every entry point: if the
    checkpoint was saved from a different architecture (e.g. a
    bunch=1 vocoder restored under cfg.lpcnet.bunch=2) the failure
    used to be a cryptic leaf-count/unflatten error; here it names
    the mismatch (leaf counts and the first differing leaf shape).
    `payload` may be the raw checkpoint dict (uses payload['params'])
    or a params pytree itself.
    """
    import jax.numpy as jnp
    if isinstance(payload, dict) and "params" in payload:
        payload = payload["params"]
    t_leaves, t_def = jax.tree_util.tree_flatten(template)
    p_leaves = jax.tree_util.tree_leaves(payload)
    if len(t_leaves) != len(p_leaves):
        raise ValueError(
            f"checkpoint does not match the configured {what}: expected "
            f"{len(t_leaves)} param arrays ({type(template).__name__}), "
            f"checkpoint holds {len(p_leaves)}. For vocoders this "
            f"usually means cfg.lpcnet.bunch (1/2/4) disagrees with the "
            f"architecture the checkpoint was trained with.")
    for i, (t, p) in enumerate(zip(t_leaves, p_leaves)):
        if tuple(np.shape(t)) != tuple(np.shape(p)):
            raise ValueError(
                f"checkpoint does not match the configured {what}: leaf "
                f"{i} expects shape {tuple(np.shape(t))} but the "
                f"checkpoint holds {tuple(np.shape(p))} — model size "
                f"config (units/dims) disagrees with the checkpoint.")
    return jax.tree_util.tree_unflatten(
        t_def, [jnp.asarray(v) for v in p_leaves])


def log_epoch(save_dir: str, label: str, epoch: int, duration: float,
              train_loss: float, valid_loss: float,
              debugging: bool = False) -> str:
    """Append the reference-format results line (utils.py:138)."""
    record = ("Epoch: {} | time: {:.2f} | train_loss: {:.4f} | "
              "valid_loss: {:.4f} \n").format(epoch, duration,
                                              train_loss, valid_loss)
    print(record, end="")
    if not debugging:
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, label + ".txt"), "a+") as f:
            f.write(record)
    return record


def save_codebooks(path: str, codebooks) -> None:
    """Persist a Codebooks pytree as .npz (interchangeable arrays)."""
    from fpsc_tpu.models.frame_predictor import Codebooks
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {"scl": np.asarray(codebooks.scl)}
    for i, cb in enumerate(codebooks.vq):
        arrays[f"vq_{i}"] = np.asarray(cb)
    if codebooks.scl_bl is not None:
        arrays["scl_bl"] = np.asarray(codebooks.scl_bl)
    if codebooks.vq_bl is not None:
        for i, cb in enumerate(codebooks.vq_bl):
            arrays[f"vq_bl_{i}"] = np.asarray(cb)
    np.savez(path, **arrays)


def save_priors(path: str, priors: dict) -> None:
    """Attach shared entropy-model priors (range_coder.collect_priors
    output) to an existing codebook .npz — both codec sides must seed
    their adaptive tables identically, so the priors ship WITH the
    artifacts.  `prior__` keys are invisible to load_codebooks."""
    z = dict(np.load(path))
    z.update({f"prior__{k}": np.asarray(v) for k, v in priors.items()})
    np.savez(path, **z)


def load_priors(path: str):
    """Priors dict stored by save_priors, or None when absent."""
    z = np.load(path)
    priors = {k[len("prior__"):]: z[k] for k in z.files
              if k.startswith("prior__")}
    return priors or None


def load_codebooks(path: str):
    import jax.numpy as jnp
    from fpsc_tpu.models.frame_predictor import Codebooks
    z = np.load(path)
    vq = tuple(jnp.asarray(z[k]) for k in sorted(z.files)
               if k.startswith("vq_") and not k.startswith("vq_bl_"))
    vq_bl = tuple(jnp.asarray(z[k]) for k in sorted(z.files)
                  if k.startswith("vq_bl_"))
    return Codebooks(
        scl=jnp.asarray(z["scl"]),
        vq=vq,
        scl_bl=jnp.asarray(z["scl_bl"]) if "scl_bl" in z.files else None,
        vq_bl=vq_bl if vq_bl else None,
    )
