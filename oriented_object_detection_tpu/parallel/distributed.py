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
