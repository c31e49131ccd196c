"""Device mesh + sharding helpers.

The reference is single-process single-GPU with hardcoded '.to("cuda")'
(reference: src/models/wavernn.py:20, SURVEY.md section 2.3) - all
parallelism here is new, TPU-native design: a 2-D ('data', 'model')
mesh; batches shard over 'data' (pure DP over utterances), wide model
axes (codebook entries, vocoder channels) may shard over 'model'.
XLA inserts the psum/all-gather collectives over ICI.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    total = len(devices)
    if n_data is None or n_data <= 0:
        n_data = total // n_model
    assert n_data * n_model <= total, (
        f"mesh {n_data}x{n_model} needs more than {total} devices")
    grid = np.asarray(devices[: n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(grid, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put every array in a batch pytree with the batch axis on
    'data' (the host->device boundary of the input pipeline).  Arrays
    whose batch axis is not divisible by the data-axis size fall back
    to replication (small eval/debug batches)."""
    n_data = mesh.shape["data"]
    sh = data_sharding(mesh)
    rep = replicated(mesh)

    def put(x):
        use = sh if (getattr(x, "ndim", 0) >= 1
                     and x.shape[0] % n_data == 0) else rep
        return jax.device_put(x, use)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
