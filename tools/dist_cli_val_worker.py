"""Two-process `oodt val --dist` worker (CPU backend).

Each process infers a disjoint stride shard of the val tile list on its
own 4 local devices; packed det/GT rows allgather and BOTH processes
hold the identical global metric (inference is per-sample independent,
so the sharded result is bit-identical to single-process). The harness
(tests/test_distributed.py::TestTwoProcessCLIVal) compares the dumped
fitness/mAP to a single-process `oodt val` of the same list.

Usage: python tools/dist_cli_val_worker.py COORD NPROCS PID VAL_LIST CKPT OUT_JSON
"""

from __future__ import annotations

import json
import os
import sys


def main():
    coord, n_procs, pid, val_list, ckpt, out_path = (
        sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5],
        sys.argv[6])

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4").strip()

    import jax

    # undo the sitecustomize-forced axon TPU plugin BEFORE backend init
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from oriented_object_detection_tpu.cli import main as cli_main

    res = cli_main([
        "val", "--dist", "--coordinator", coord,
        "--num-processes", n_procs, "--process-id", pid,
        "--ckpt", ckpt, "--val-list", val_list,
    ])
    with open(out_path, "w") as f:
        json.dump({"process_index": jax.process_index(),
                   "n_devices_global": len(jax.devices()),
                   **{k: float(v) for k, v in res.items()}}, f)
    print(f"[dist_cli_val_worker {pid}] fitness={res['fitness']:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
