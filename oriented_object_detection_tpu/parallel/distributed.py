"""Multi-host runtime initialization (DCN + ICI).

The reference's distributed story ends at single-node 2-GPU DDP
(`Train_OBB.py:39-42`). The TPU-native equivalent scales past one host:
`jax.distributed.initialize` joins the hosts into one runtime, after which
the same `parallel.mesh` data mesh spans every chip — XLA routes the
gradient all-reduce over ICI within a slice and DCN across hosts. Nothing
else in the framework changes: params stay replicated, batches shard on
the global mesh, per-host input pipelines feed their local shard via
`host_local_batch_to_global`.

Inference scales the same way (beyond the reference, which never runs
multi-GPU inference): every process executes the same
`TiledDetector(..., mesh=global_mesh).detect_image(...)` SPMD-style and
`infer/pipeline._to_host` allgathers the packed result to every host
(tools/dist_infer_worker.py + tests/test_distributed.py prove 2-process
parity with the single-device rows).

Training is multi-process end to end: `trainer.fit(..., mesh=global_mesh)`
treats `train_batches` as each process's LOCAL rows, reassembles the
global sharded batch per step, and gates checkpoints/results.csv/logs to
process 0 (the DDP RANK-0 semantics); `oodt train --dist` wires it from
the CLI with process-0 dataset preprocessing behind a global barrier.
tools/dist_fit_worker.py + tools/dist_cli_train_worker.py prove 2-process
parity of the trained params with a single-process fit of the same global
batch stream.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host runtime (no-op on a single host / if already
    initialized). On TPU pods the arguments auto-detect from the
    environment."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:
        # double-initialization is a no-op; "must be called before any
        # JAX calls" is real misuse and propagates
        if "already" not in str(e).lower():
            raise
    except ValueError as e:
        # single host with no cluster environment: coordinator address
        # cannot be auto-detected — the single-process runtime is fine
        if "coordinator_address" not in str(e):
            raise


def make_global_data_mesh(batch_size: int):
    """Data mesh that SPANS every process: the largest device count that
    divides batch_size, is a multiple of the process count, and fits the
    global device pool — taking an equal number of local devices from
    every process (in process order, so `host_local_batch_to_global`'s
    per-process row slices land on that process's own devices).

    `mesh.make_mesh(n_data=k)` takes the first k GLOBAL devices, which
    for k < n_global are all process 0's — a mesh that leaves process 1
    addressing zero batch rows. Multi-process callers use this instead."""
    from .mesh import make_mesh

    procs = jax.process_count()
    by_proc: dict[int, list] = {}
    for d in jax.devices():
        by_proc.setdefault(d.process_index, []).append(d)
    max_per = min(len(v) for v in by_proc.values())
    n_data = 0
    for d in range(min(len(jax.devices()), batch_size), 0, -1):
        if batch_size % d == 0 and d % procs == 0 \
                and d // procs <= max_per:
            n_data = d
            break
    if not n_data:
        raise ValueError(
            f"no data-axis size spans {procs} processes and divides "
            f"batch_size={batch_size}")
    per = n_data // procs
    devs = [d for p in sorted(by_proc) for d in by_proc[p][:per]]
    return make_mesh(n_data=n_data, devices=devs)


def host_local_batch_to_global(batch, mesh):
    """Assemble a global sharded batch from per-host local shards: each
    host passes its local slice (global_batch / num_hosts rows);
    the result is one global jax.Array sharded over the data axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))

    def one(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape)

    return jax.tree.map(one, batch)
