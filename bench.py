"""Benchmark: golden dual-scale tiled-inference throughput on one TPU chip.

Workload: the reference's own headline configuration — dual-scale
[128/ov30, 416/ov100] tiled detection (`Detect_OBB.py:24-26`) over the two
golden image geometries (895x807 and 1056x1028 => 90+9+121+16 = 236 tiles),
with the x-scale YOLOv11-OBB on every tile, in-graph decode + ProbIoU NMS +
border filter + exact-IoU per-tile merge, host consensus fusion and global
merge. Content is synthetic (speed is content-independent); weights are the
trained checkpoint if present, else random init.

Baseline: the reference runs one ultralytics yolo11x-obb predict call per
tile on CPU (no published hardware numbers — BASELINE.md). Measured on
this container with tools/baseline_cpu.py (per-tile serial yolo11x-obb
fp32 forwards incl. decode+NMS on the JAX CPU backend, golden workload
mix): 4.25 tiles/sec (133 ms/tile @128, 1096 ms/tile @416).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


REFERENCE_TILES_PER_SEC = 4.25  # measured, tools/baseline_cpu.py


def main():
    import jax

    from oriented_object_detection_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()

    from oriented_object_detection_tpu.config import (DetectConfig,
                                                      ScaleConfig)
    from oriented_object_detection_tpu.infer.pipeline import TiledDetector
    from oriented_object_detection_tpu.models import YOLO11OBB

    cfg = DetectConfig(
        scales=(ScaleConfig(128, 30), ScaleConfig(416, 100)),
        channels=3)

    params = {}
    for sc in cfg.scales:
        ck = f"runs/obb/train{sc.tile_size}/best.ckpt"
        if os.path.exists(ck):
            from oriented_object_detection_tpu.train.trainer import (
                variables_from_checkpoint)
            params[sc.tile_size] = variables_from_checkpoint(ck)
        else:
            m = YOLO11OBB(nc=cfg.nc, scale=sc.model_scale, in_channels=3)
            x = np.zeros((1, sc.tile_size, sc.tile_size, 3), np.float32)
            params[sc.tile_size] = m.init(jax.random.PRNGKey(0), x)

    det = TiledDetector(cfg, params)

    rng = np.random.RandomState(0)
    # golden image geometries (Input/Test1.png, Input/Test2.png)
    images = [
        rng.randint(0, 255, (807, 895, 3)).astype(np.uint8),
        rng.randint(0, 255, (1028, 1056, 3)).astype(np.uint8),
    ]
    n_tiles = 90 + 9 + 121 + 16

    # warmup / compile
    det.detect_images(images)

    reps = 5
    t0 = time.time()
    for _ in range(reps):
        det.detect_images(images)
    dt = (time.time() - t0) / reps
    tps = n_tiles / dt

    # production-scale map: a 4096x4096 scan (1764 + 169 = 1933 tiles) —
    # the golden geometry is launch-latency-bound; large maps amortize it
    big = rng.randint(0, 255, (4096, 4096, 3)).astype(np.uint8)
    big_tiles = 42 * 42 + 13 * 13
    det.detect_images([big])  # warmup/compile
    t0 = time.time()
    for _ in range(3):
        det.detect_images([big])
    big_dt = (time.time() - t0) / 3
    big_tps = big_tiles / big_dt

    out = {
        "metric": ("golden dual-scale [128/30,416/100] yolo11x-obb "
                   "end-to-end tiles/sec (Test1+Test2 geometry, "
                   "236 tiles)"),
        "value": round(tps, 2),
        "unit": "tiles/sec",
        "vs_baseline": round(tps / REFERENCE_TILES_PER_SEC, 2),
        "full_map_ms": round(dt * 1000.0, 1),
        "large_map_tiles_per_sec": round(big_tps, 2),
        "large_map_ms": round(big_dt * 1000.0, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
