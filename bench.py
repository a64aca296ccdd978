"""Benchmark: golden dual-scale tiled-inference throughput on one TPU chip.

Workload: the reference's own headline configuration — dual-scale
[128/ov30, 416/ov100] tiled detection (`Detect_OBB.py:24-26`) over the two
golden image geometries (895x807 and 1056x1028 => 90+9+121+16 = 236 tiles),
with the x-scale YOLOv11-OBB on every tile, in-graph decode + ProbIoU NMS +
border filter + exact-IoU per-tile merge, host consensus fusion and global
merge. Content is synthetic (speed is content-independent); weights are the
trained checkpoint if present, else random init with the cls biases
CALIBRATED so a reference-like fraction of anchors crosses conf 0.25 —
without this, a fresh sparse-bias init emits ~zero detections and the
host NMS/merge/fusion path would be absent from the number (VERDICT r01).

Also reports the 4-channel DT-Edge configuration (BASELINE config #3,
`Detect_OBB.py:98-130`): single-scale 416/ov100 with the in-graph DT-Edge
channel (multi-scale Scharr -> percentile binarize -> morph open ->
Pallas exact L2 EDT -> soft blend) on every tile.

Baseline: the reference runs one ultralytics yolo11x-obb predict call per
tile on CPU (no published hardware numbers — BASELINE.md). Measured on
this container with tools/baseline_cpu.py (per-tile serial yolo11x-obb
fp32 forwards incl. decode+NMS on the JAX CPU backend, golden workload
mix): 4.25 tiles/sec (133 ms/tile @128, 1096 ms/tile @416).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

import numpy as np


REFERENCE_TILES_PER_SEC = 4.25  # measured, tools/baseline_cpu.py

# fraction of anchors that should cross conf 0.25 under random init —
# yields reference-like raw det counts (a few hundred per map pre-merge)
DENSITY_TARGET = 0.01


def _calibrate_density(model, variables, tile_size, channels, target):
    """Shift every cls-branch bias so `target` of anchors land at conf
    ~0.45 (comfortably above the 0.25 predict threshold).

    Random init emits an almost-constant tiny conf everywhere (sparse
    bias init, near-zero logit variance), so the shifted tail must be
    pinned WELL above the threshold: pinning it at exactly 0.25 collapses
    under bf16 rounding on TPU (every score quantizes to the threshold
    and the > comparison drops all of them — observed as det_counts
    [0, 0] in the first r02 bench run). The shifted anchors exercise
    per-tile NMS + host merge with reference-like density; the consensus
    stage still drops most (random boxes have no cross-scale partners —
    its sequential scan is exercised, its output is near-empty)."""
    import jax
    import jax.numpy as jnp

    from oriented_object_detection_tpu.models import decode as D

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randint(0, 255, (8, tile_size, tile_size,
                                         channels)) / 255.0, jnp.float32)

    @jax.jit
    def fwd(v, xx):
        # must be jitted: an eager x-scale forward dispatches hundreds of
        # per-op tunnel RPCs on this box and stalls for minutes
        return D.decode_raw(model.apply(v, xx), tile_size)[1]

    scores = fwd(variables, x)
    s = np.asarray(scores, np.float64).reshape(-1)
    s = np.clip(s, 1e-9, 1 - 1e-9)
    logits = np.log(s / (1 - s))
    thr_logit = float(np.log(0.45 / 0.55))
    offset = thr_logit - float(np.quantile(logits, 1.0 - target))

    def shift(path, leaf):
        keys = [getattr(k, "key", "") for k in path]
        if any(str(k).startswith("cv3_") and str(k).endswith("_2")
               for k in keys) and str(keys[-1]) == "bias":
            return leaf + offset
        return leaf

    return jax.tree_util.tree_map_with_path(shift, variables)


def _build_detector(cfg, calibrate, use_ckpt=False):
    """use_ckpt=False: flagship x-scale random init (+density calibration)
    — the headline configuration, comparable across rounds. use_ckpt=True:
    load runs/obb/train{ts}/best.ckpt when present (the checkpoint records
    its model scale, so e.g. synthetic n-scale checkpoints bench with the
    matching architecture); returns None if any scale's ckpt is missing."""
    import dataclasses

    import jax

    from oriented_object_detection_tpu.infer.pipeline import TiledDetector
    from oriented_object_detection_tpu.models import YOLO11OBB

    params = {}
    weights = []
    scales = []
    for sc in cfg.scales:
        ck = f"runs/obb/train{sc.tile_size}/best.ckpt"
        if use_ckpt:
            if not os.path.exists(ck):
                return None, None
            from oriented_object_detection_tpu.train.trainer import (
                load_checkpoint)
            ckd = load_checkpoint(ck)
            extra = ckd.get("extra", {})
            sc = dataclasses.replace(
                sc, model_scale=extra.get("model_scale", sc.model_scale))
            p = ckd["ema_params"] if ckd.get("ema_params") is not None \
                else ckd["params"]
            params[sc.tile_size] = {"params": p,
                                    "batch_stats": ckd["batch_stats"]}
            weights.append(
                f"{sc.tile_size}:ckpt[{sc.model_scale}]")
        else:
            m = YOLO11OBB(nc=cfg.nc, scale=sc.model_scale,
                          in_channels=cfg.channels)
            x = np.zeros((1, sc.tile_size, sc.tile_size, cfg.channels),
                         np.float32)
            v = m.init(jax.random.PRNGKey(0), x)
            if calibrate:
                v = _calibrate_density(m, v, sc.tile_size, cfg.channels,
                                       DENSITY_TARGET)
                weights.append(f"{sc.tile_size}:random+density")
            else:
                weights.append(f"{sc.tile_size}:random")
            params[sc.tile_size] = v
        scales.append(sc)
    cfg = dataclasses.replace(cfg, scales=tuple(scales))
    return TiledDetector(cfg, params), ",".join(weights)


def _time_reps(fn, reps):
    """Median rep time: wall times through the TPU tunnel carry
    occasional multi-hundred-ms RPC hiccups that a mean absorbs into the
    headline (observed 611-1146 tiles/sec spread on the large map)."""
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return float(np.median(times))


def main():
    from oriented_object_detection_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()

    from oriented_object_detection_tpu.config import (DetectConfig,
                                                      ScaleConfig)
    from oriented_object_detection_tpu.utils import profiling as prof

    rng = np.random.RandomState(0)
    # golden image geometries (Input/Test1.png, Input/Test2.png) with
    # GeoMap-like synthetic content: content does not change the
    # fixed-shape device programs' time, but trained checkpoints produce
    # realistic detections on it (pure noise yields none at scale 416)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.train_synthetic import gen_map

    images = [
        gen_map(rng, H=807, W=895, n_obj=40)[0],
        gen_map(rng, H=1028, W=1056, n_obj=40)[0],
    ]
    n_tiles = 90 + 9 + 121 + 16

    # ---- headline: dual-scale 3ch, x-scale, realistic density ----------
    cfg = DetectConfig(
        scales=(ScaleConfig(128, 30), ScaleConfig(416, 100)), channels=3)
    det, weights = _build_detector(cfg, calibrate=True)

    det.detect_images(images)            # warmup / compile
    det_counts = [len(r["merged_for_pr"])
                  for r in det.detect_images(images)]
    prof.reset()
    dt = _time_reps(lambda: det.detect_images(images), 5)
    stage_ms = {k: round(v["total_s"] * 1000.0 / 5, 1)
                for k, v in prof.report().items()}
    tps = n_tiles / dt

    # ---- production-scale map: 4096x4096 (1764 + 169 = 1933 tiles) -----
    big = rng.randint(0, 255, (4096, 4096, 3)).astype(np.uint8)
    big_tiles = 42 * 42 + 13 * 13
    det.detect_images([big])             # warmup/compile
    big_dt = _time_reps(lambda: det.detect_images([big]), 5)
    big_tps = big_tiles / big_dt

    # ---- trained checkpoints (realistic detection density) -------------
    # synthetic-trained n-scale checkpoints (tools/e2e_synthetic.py)
    # copied to runs/obb/train{128,416}/best.ckpt give the host
    # merge/consensus/fusion path real work; reported next to the
    # random-init headline per VERDICT r01 #5
    trained = {}
    det_t, weights_t = _build_detector(cfg, calibrate=False, use_ckpt=True)
    if det_t is not None:
        det_t.detect_images(images)      # warmup/compile
        counts_t = [len(r["merged_for_pr"])
                    for r in det_t.detect_images(images)]
        dt_t = _time_reps(lambda: det_t.detect_images(images), 5)
        trained = {
            "trained_tiles_per_sec": round(n_tiles / dt_t, 2),
            "trained_full_map_ms": round(dt_t * 1000.0, 1),
            "trained_weights": weights_t,
            "trained_det_counts": counts_t,
        }

    # ---- 4ch DT-Edge single-scale 416 (BASELINE config #3) -------------
    cfg4 = DetectConfig(scales=(ScaleConfig(416, 100),), channels=4)
    det4, weights4 = _build_detector(cfg4, calibrate=True)
    n_tiles4 = 9 + 16
    det4.detect_images(images)           # warmup/compile (incl. EDT)
    dt4 = _time_reps(lambda: det4.detect_images(images), 5)
    tps4 = n_tiles4 / dt4

    out = {
        "metric": ("golden dual-scale [128/30,416/100] yolo11x-obb "
                   "end-to-end tiles/sec (Test1+Test2 geometry, "
                   "236 tiles)"),
        "value": round(tps, 2),
        "unit": "tiles/sec",
        "vs_baseline": round(tps / REFERENCE_TILES_PER_SEC, 2),
        "full_map_ms": round(dt * 1000.0, 1),
        "weights": weights,
        "det_counts": det_counts,
        "stage_ms_per_rep": stage_ms,
        "large_map_tiles_per_sec": round(big_tps, 2),
        "large_map_ms": round(big_dt * 1000.0, 1),
        "dtedge_4ch_416_tiles_per_sec": round(tps4, 2),
        "dtedge_4ch_416_full_map_ms": round(dt4 * 1000.0, 1),
        **trained,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
