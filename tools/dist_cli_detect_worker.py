"""Two-process `oodt detect --dist` worker (CPU backend).

End-to-end CLI check of the multi-host inference path (VERDICT r04 #5):
two processes join one jax.distributed runtime (4 local devices each, 8
global), run the SAME `oodt detect --dist --batch` over a global mesh —
the tile batch shards across all 8 devices, `pipeline._to_host`
allgathers the packed result — and process 0 alone writes the
`*_detected.jpg` / `*.xlsx` artifacts. The harness
(tests/test_distributed.py::TestTwoProcessCLIDetect) compares process
0's xlsx rows to a single-process run of the same inputs and asserts
process 1 wrote nothing.

Usage: python tools/dist_cli_detect_worker.py COORD NPROCS PID INPUT_DIR OUT_DIR CKPT
"""

from __future__ import annotations

import os
import sys


def main():
    coord, n_procs, pid, input_dir, out_dir, ckpt = (
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

    cli_main([
        "detect", "--dist", "--coordinator", coord,
        "--num-processes", n_procs, "--process-id", pid,
        "--input", input_dir, "--output", out_dir,
        "--scales", f"128:30={ckpt}",
    ])
    print(f"[dist_cli_detect_worker {pid}] ok", flush=True)


if __name__ == "__main__":
    main()
