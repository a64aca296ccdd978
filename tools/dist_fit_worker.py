"""Two-process distributed fit() worker.

Extends tools/dist_worker.py (one DP step) to the FULL training loop:
both processes join one jax.distributed CPU runtime (4 virtual devices
each -> 8 global) and run trainer.fit() SPMD over the global mesh for a
few tiny epochs — each process feeds its LOCAL half of a deterministic
global batch stream, fit() assembles the global arrays per step, and
checkpoints/results.csv are written by process 0 only (the reference's
DDP-trainer semantics, Train_OBB.py:39-42, where ultralytics gates
artifact writes on RANK in {-1, 0}).

The harness (tests/test_distributed.py::TestTwoProcessFit) asserts:
  * both processes finish and report the same final loss;
  * process 0's results.csv losses match a single-process fit() of the
    SAME global batch stream on an 8-device mesh;
  * only process 0 wrote best/last checkpoints and run artifacts.

Usage: python tools/dist_fit_worker.py COORD NUM_PROCS PROC_ID OUT_JSON CKPT_DIR
"""

from __future__ import annotations

import json
import os
import sys

EPOCHS = 2
STEPS = 3
B_GLOBAL = 8


def make_global_batch(epoch: int, step: int):
    """Deterministic global batch — identical on every process."""
    import numpy as np

    rng = np.random.RandomState(1000 * epoch + step)
    return {
        "images": rng.rand(B_GLOBAL, 32, 32, 3).astype(np.float32),
        "gt_labels": np.full((B_GLOBAL, 2), 1, np.int32),
        "gt_xywhr": np.tile(np.array([[[16.0, 16, 10, 8, 0.3],
                                       [8.0, 8, 6, 5, -0.2]]], np.float32),
                            (B_GLOBAL, 1, 1)),
        "gt_mask": np.ones((B_GLOBAL, 2), bool),
    }


def batches_for(pid: int, n_procs: int):
    """Epoch iterable of this process's LOCAL rows (fit() multi-process
    input contract: global_batch / num_hosts rows per process)."""
    rows = B_GLOBAL // n_procs

    def train_batches(epoch: int):
        for step in range(STEPS):
            full = make_global_batch(epoch, step)
            yield {k: v[pid * rows:(pid + 1) * rows]
                   for k, v in full.items()}

    return train_batches


def main():
    coord, n_procs, pid, out_path, ckpt_dir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5])

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4").strip()

    import jax

    # undo the sitecustomize-forced axon TPU plugin BEFORE backend init
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=n_procs, process_id=pid)

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from oriented_object_detection_tpu.config import TrainConfig
    from oriented_object_detection_tpu.parallel import mesh as PM
    from oriented_object_detection_tpu.train import trainer as TR

    n_global = len(jax.devices())
    mesh = PM.make_mesh(n_data=n_global)

    cfg = TrainConfig(tile_size=32, model_scale="n",
                      compute_dtype="float32", epochs=EPOCHS,
                      plots=False)
    model, state, tx = TR.create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=STEPS)

    state = TR.fit(model, state, tx, cfg, batches_for(pid, n_procs),
                   val_fn=None, ckpt_dir=ckpt_dir, mesh=mesh,
                   log_every=100)

    # final-params checksum: a scalar every process must agree on
    # (replicated state) AND that the harness compares against its own
    # single-process fit of the same global batch stream
    checksum = float(sum(np.abs(np.asarray(l, np.float64)).sum()
                         for l in jax.tree.leaves(state.params)))

    with open(out_path, "w") as f:
        json.dump({
            "process_count": jax.process_count(),
            "process_index": jax.process_index(),
            "n_devices_global": n_global,
            "param_checksum": checksum,
            "steps": int(state.step),
        }, f)
    print(f"[dist_fit_worker {pid}] checksum={checksum:.6f} "
          f"procs={jax.process_count()}")


if __name__ == "__main__":
    main()
