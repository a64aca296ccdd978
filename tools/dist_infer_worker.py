"""Two-process distributed INFERENCE worker (multi-host detect DP).

The single-controller mesh path of `TiledDetector` shards the tile batch
over all devices of a global mesh; under `jax.distributed` the same
detect call runs SPMD on every process, and the packed result — which
spans non-addressable devices — is allgathered back to every host by
`infer/pipeline._to_host` before the host merge/fusion stages. This
worker joins a 2-process CPU runtime (4 virtual devices each, 8 global),
detects one synthetic map through the committed n-scale checkpoint, and
writes the merged rows as JSON; the harness
(`tests/test_distributed.py::TestTwoProcessInference`) compares them to
a single-process run of the same image. Extends the reference's
single-node DDP story (`Train_OBB.py:39-42`) to multi-host *inference*,
which the reference has no equivalent for.

Usage: python tools/dist_infer_worker.py COORD_ADDR NUM_PROCS PROC_ID OUT_JSON
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

    # undo the container's forced axon TPU plugin BEFORE any backend touch
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=n_procs, process_id=pid)

    import numpy as np

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    from oriented_object_detection_tpu.config import (DetectConfig,
                                                      ScaleConfig)
    from oriented_object_detection_tpu.infer.pipeline import TiledDetector
    from oriented_object_detection_tpu.parallel import mesh as PM
    from oriented_object_detection_tpu.train.trainer import load_checkpoint
    from tools.train_synthetic import gen_map

    ck = load_checkpoint(os.path.join(
        root, "assets", "bench_ckpts", "train128.ckpt"))
    cfg = DetectConfig(
        scales=(ScaleConfig(128, 30,
                            model_scale=ck["extra"]["model_scale"]),),
        channels=3, compute_dtype="float32")
    params = {128: {"params": ck["params"],
                    "batch_stats": ck["batch_stats"]}}
    img = gen_map(np.random.RandomState(0), H=400, W=500, n_obj=15)[0]

    mesh = PM.make_mesh()        # all 8 global devices, both processes
    det = TiledDetector(cfg, params, max_det=32, pre_topk=64, mesh=mesh)
    with mesh:
        rows = det.detect_image(img)["merged_for_pr"]

    with open(out_path, "w") as f:
        json.dump({
            "process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "n_devices_global": len(jax.devices()),
            "rows": np.asarray(rows).tolist(),
        }, f)
    print(f"[dist_infer_worker {pid}] dets={len(rows)} ok", flush=True)


if __name__ == "__main__":
    main()
