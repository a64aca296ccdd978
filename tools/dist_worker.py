"""Two-process distributed worker (VERDICT r03 missing #3).

Joins a real multi-process jax.distributed runtime on the CPU backend
(4 virtual devices per process -> 8 global), assembles a global batch
from per-process local shards via `host_local_batch_to_global`, runs ONE
data-parallel train step on the global 8-device mesh, and writes the
loss (+ runtime facts) as JSON. The test harness
(`tests/test_distributed.py::TestTwoProcessRuntime`) spawns two of these
and asserts the loss matches a single-process run on the same full batch
— which fails if the local->global assembly scattered rows wrongly or
the cross-process gradient all-reduce diverged.

Usage: python tools/dist_worker.py COORD_ADDR NUM_PROCS PROC_ID OUT_JSON
"""

from __future__ import annotations

import json
import os
import sys


def main():
    coord, n_procs, pid, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4").strip()

    import jax

    # this container's sitecustomize forces the axon TPU plugin; undo it
    # BEFORE the first backend touch (distributed.initialize counts)
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=n_procs, process_id=pid)

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from oriented_object_detection_tpu.config import TrainConfig
    from oriented_object_detection_tpu.parallel import distributed as DIST
    from oriented_object_detection_tpu.parallel import mesh as PM
    from oriented_object_detection_tpu.train import trainer as TR
    from oriented_object_detection_tpu.train.loss import LossConfig

    n_global = len(jax.devices())
    mesh = PM.make_mesh(n_data=n_global)

    cfg = TrainConfig(tile_size=32, model_scale="n",
                      compute_dtype="float32", epochs=1)
    model, state, tx = TR.create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=4)
    step_fn = TR.make_train_step(model, tx, cfg, LossConfig(img_size=32))

    # deterministic GLOBAL batch (all processes derive the same full
    # array from the same seed); each process feeds only ITS local rows
    rng = np.random.RandomState(42)
    B = n_global  # one row per global device
    full = {
        "images": rng.rand(B, 32, 32, 3).astype(np.float32),
        "gt_labels": np.full((B, 2), 1, np.int32),
        "gt_xywhr": np.tile(np.array([[[16.0, 16, 10, 8, 0.3],
                                       [8.0, 8, 6, 5, -0.2]]], np.float32),
                            (B, 1, 1)),
        "gt_mask": np.ones((B, 2), bool),
    }
    rows = B // n_procs
    local = {k: v[pid * rows:(pid + 1) * rows] for k, v in full.items()}

    with mesh:
        state = PM.replicate(state, mesh)
        batch = DIST.host_local_batch_to_global(local, mesh)
        shapes = {k: tuple(v.shape) for k, v in batch.items()}
        _, metrics = step_fn(state, batch)
        loss = float(TR.metrics_dict(metrics)["loss"])

    with open(out_path, "w") as f:
        json.dump({
            "process_count": jax.process_count(),
            "process_index": jax.process_index(),
            "n_devices_global": n_global,
            "n_devices_local": len(jax.local_devices()),
            "global_batch_shapes": {k: list(v) for k, v in shapes.items()},
            "loss": loss,
        }, f)
    print(f"[dist_worker {pid}] loss={loss:.6f} "
          f"procs={jax.process_count()} global_dev={n_global}")


if __name__ == "__main__":
    main()
