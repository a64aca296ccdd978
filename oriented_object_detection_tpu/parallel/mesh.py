"""Device mesh + sharding helpers (pjit data parallelism).

The reference's only parallelism is 2-GPU DDP via torch/NCCL
(`Train_OBB.py:25,39-42`). The TPU-native equivalent is a 1-D `data` mesh:
parameters replicated, batches sharded on the leading axis, gradient
all-reduce inserted by XLA from the sharding annotations (riding ICI).
The same helpers shard inference tile batches across chips.

A `model` axis is reserved in `make_mesh` for future tensor parallelism
(SURVEY.md §2.4: not needed at this model size, left free by design).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data mesh by default; (data, model) if n_model > 1."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/tile) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Put every leaf of a batch pytree with its leading dim sharded over
    the data axis."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def best_data_axis_size(batch_size: int,
                        n_devices: Optional[int] = None) -> int:
    """Largest device count <= n_devices that divides the batch size
    (sharded dims must divide evenly)."""
    n = n_devices if n_devices is not None else len(jax.devices())
    for d in range(min(n, batch_size), 0, -1):
        if batch_size % d == 0:
            return d
    return 1
