"""Device mesh + sharding helpers (pjit data parallelism).

The reference's only parallelism is 2-GPU DDP via torch/NCCL
(`Train_OBB.py:25,39-42`). The TPU-native equivalent is a 1-D `data` mesh:
parameters replicated, batches sharded on the leading axis, gradient
all-reduce inserted by XLA from the sharding annotations (riding ICI).
The same helpers shard inference tile batches across chips.

A `model` axis complements it: `shard_model`/`shard_train_state` weight-
shard params/EMA/momentum over it (ZeRO-3-style; SURVEY.md §2.4 reserves
the axis — this model fits one chip, so the win is optimizer+EMA memory,
and the layout is the template for anything bigger).
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


def shard_model(tree, mesh: Mesh):
    """Weight-shard a parameter pytree over the `model` axis.

    Every leaf whose trailing (output-channel for HWIO conv kernels,
    feature for biases/BN) dimension divides the model-axis size is split
    over that axis; the rest replicate. With the batch sharded over
    `data`, XLA/GSPMD inserts the per-layer all-gathers (ZeRO-3-style
    weight sharding) or keeps activations channel-sharded (Megatron-style
    TP) — whichever its cost model prefers. At this model size the win is
    memory (params + momentum + EMA scale 1/n_model per chip), the
    TPU-native replacement for what the reference would need if the model
    outgrew one GPU (SURVEY.md §2.4: model axis reserved by design)."""
    n = mesh.shape[MODEL_AXIS]
    if n == 1:
        return replicate(tree, mesh)

    def put(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[-1] % n == 0:
            spec = P(*([None] * (x.ndim - 1)), MODEL_AXIS)
        else:
            spec = P()  # odd dims (e.g. the 1-channel angle head bias)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def shard_train_state(state, mesh: Mesh):
    """Lay out a TrainState for (data, model) training: params, EMA and
    SGD momentum weight-sharded over `model`; every other field (known
    or future — the state is slimmed, not enumerated) replicated. The
    big trees are put with their final layout directly: replicating them
    first would transiently materialize n_model full copies of exactly
    the trees this function exists to shard. With n_model == 1 this
    degrades to full replication."""
    slim = state.replace(params=(), ema_params=(), opt_state=())
    repl = replicate(slim, mesh)  # generic over any OTHER/future field
    return repl.replace(
        params=shard_model(state.params, mesh),
        ema_params=shard_model(state.ema_params, mesh),
        opt_state=shard_model(state.opt_state, mesh))


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
