"""Two-process `oodt train --dist` worker (CPU backend).

End-to-end CLI check of the multi-process training path: dataset
preprocessing gated to process 0 behind the global barrier, per-process
local batch shards reassembled by fit(), artifacts written by process 0
only. The harness (tests/test_distributed.py::TestTwoProcessCLITrain)
pre-generates a tiny synthetic dataset, spawns two of these, and checks
the run directory.

Usage: python tools/dist_cli_train_worker.py COORD NPROCS PID DATA_ROOT CKPT_DIR
"""

from __future__ import annotations

import os
import sys


def main():
    coord, n_procs, pid, data_root, ckpt_dir = (
        sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5])

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4").strip()

    import jax

    # undo the sitecustomize-forced axon TPU plugin BEFORE backend init
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from oriented_object_detection_tpu.cli import main as cli_main

    cli_main([
        "train", "--dist", "--coordinator", coord,
        "--num-processes", n_procs, "--process-id", pid,
        "--data-root", data_root, "--tile-size", "128",
        "--overlap", "32", "--epochs", "1", "--batch-size", "4",
        "--scale", "n", "--ckpt-dir", ckpt_dir,
    ])
    print(f"[dist_cli_train_worker {pid}] done")


if __name__ == "__main__":
    main()
