"""Dataset-scale DETECT + EVAL run on TPU (VERDICT r02 #5, full version).

Generates ~100 synthetic GeoMap-like maps (1000x1000 => ~100 tiles @128
+ 9 @416 each, ~10.9k tiles total, ~4k GT boxes), runs the full
dual-scale tiled detection in metrics mode through the production
pipeline (chunked so every chunk reuses ONE compiled program per scale),
then the complete evaluation suite — and records wall time per stage
(detect incl. h2d/dispatch/fetch/merge/fusion vs evaluate_map vs
center-hit vs class-wise).

Checkpoints: runs/obb/train{128,416}/best.ckpt (synthetic-trained);
falls back to random+density init if absent (stage times are
content-independent; detection counts are not).

Usage: python tools/detect_scale.py [--maps 100] [--chunk 10]
                                    [--out detect_scale.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--maps", type=int, default=100)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--out", default=None)
    ap.add_argument("--asset-tag", default="",
                    help="checkpoint family suffix, e.g. _x = the "
                         "flagship x-scale ckpts under "
                         "runs/obb/train{ts}_x/ (bench.py trained_x)")
    args = ap.parse_args(argv)

    from oriented_object_detection_tpu.utils.runtime import (
        enable_compilation_cache, link_health_probe)

    enable_compilation_cache()
    # fresh-link health embedded in the artifact: cross-round tiles/sec
    # deltas are ~2x tunnel weather otherwise (VERDICT r04 #7)
    try:
        probe = link_health_probe()
    except Exception as e:  # noqa: BLE001
        probe = {"link_probe_error": f"{type(e).__name__}: {e}"}
    print(f"[detect_scale] link probe: {probe}")

    import jax.numpy as jnp

    from bench import _build_detector
    from oriented_object_detection_tpu.config import (DetectConfig,
                                                      ScaleConfig)
    from oriented_object_detection_tpu.eval import metrics as M
    from oriented_object_detection_tpu.utils import profiling as prof
    from tools.train_synthetic import gen_map

    rng = np.random.RandomState(11)
    maps, gts = [], {}
    for k in range(args.maps):
        img, lab = gen_map(rng, H=1000, W=1000, n_obj=40)
        name = f"mem://map{k:03d}"
        maps.append((name, img))
        # labels are normalized (cls, x1..y4); eval wants pixels
        g = np.asarray(lab, np.float64).reshape(-1, 9).copy()
        g[:, 1::2] *= 1000
        g[:, 2::2] *= 1000
        gts[name] = g
    n_gt = sum(len(v) for v in gts.values())

    cfg = DetectConfig(
        scales=(ScaleConfig(128, 30), ScaleConfig(416, 100)),
        channels=3, calculate_metrics=True)
    det, weights = _build_detector(cfg, calibrate=False, use_ckpt=True,
                                   asset_tag=args.asset_tag)
    if det is None:
        print(f"[detect_scale] {weights}; using random+density")
        det, weights = _build_detector(cfg, calibrate=True)

    # per-map tile counts from the grid math (1000x1000)
    from oriented_object_detection_tpu.ops import tiling as T
    tiles_per_map = sum(
        len(T.inference_tile_grid(1000, 1000, sc.tile_size, sc.overlap))
        for sc in cfg.scales)
    n_tiles = tiles_per_map * args.maps
    print(f"[detect_scale] {args.maps} maps, {n_tiles} tiles "
          f"({tiles_per_map}/map), {n_gt} GT boxes, weights={weights}")

    # warmup: compile the chunk-shaped programs once
    warm = [im for _, im in maps[:args.chunk]]
    det.detect_images(warm)

    prof.reset()
    dets_pr, dets_map = {}, {}
    t0 = time.time()
    # pad a short final chunk to the full chunk shape (image list length
    # is part of the jit key — a smaller last chunk would trigger a fresh
    # ~20-90 s tunnel compile inside the timed loop; tile validity
    # masking makes the padded results discardable)
    names = [name for name, _ in maps]
    imgs = [im for _, im in maps]
    while len(imgs) % args.chunk:
        imgs.append(imgs[-1])
    # chunked pipelined stream: chunk k+1's H2D rides under chunk k's
    # compute+fetch, and chunk k's host merge/fusion overlaps chunk
    # k+1's device compute
    for name, res in zip(names, det.detect_stream(imgs, chunk=args.chunk)):
        dets_pr[name] = res["merged_for_pr"]
        dets_map[name] = res["merged_for_map"]
    detect_s = time.time() - t0
    stage_ms = {k: round(v["total_s"] * 1000.0, 1)
                for k, v in prof.report().items()}
    n_det = sum(len(v) for v in dets_map.values())
    print(f"[detect_scale] detect: {detect_s:.2f} s "
          f"({n_tiles / detect_s:.0f} tiles/sec), {n_det} wide dets")
    print(f"  stages: {stage_ms}")

    cache = M.GTCache(loader=lambda img: gts[img])
    timings = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        print(f"  {name}: {timings[name]:.3f} s")
        return out

    images = sorted(gts)
    P, R, F1 = timed("evaluate_dataset", lambda: M.evaluate_dataset(
        dets_pr, images, cache, conf_thr=0.25, iou_thr=0.25))
    timed("classwise_report", lambda: M.classwise_report(
        dets_pr, images, cache, conf_thr=0.25, iou_thr=0.25))
    timed("center_hit", lambda: M.evaluate_center_hit(
        dets_pr, images, cache, conf_thr=0.25))
    maps_r = timed("evaluate_map [0.5:0.95]", lambda: M.evaluate_map(
        dets_map, images, list(np.arange(0.5, 0.96, 0.05)), cache))
    timed("evaluate_map soft", lambda: M.evaluate_map(
        dets_map, images, [0.3, 0.4, 0.5, 0.6, 0.7], cache))

    out = {
        "maps": args.maps, "tiles": n_tiles, "gt_boxes": n_gt,
        "weights": weights, **probe,
        "detect_s": round(detect_s, 2),
        "detect_tiles_per_sec": round(n_tiles / detect_s, 1),
        "detect_stage_ms": stage_ms,
        "eval_timings_s": timings,
        "P": round(P, 4), "R": round(R, 4), "F1": round(F1, 4),
        "mAP@0.5": round(maps_r["mAP@0.5"], 4),
        "mAP@[0.5:0.95]": round(maps_r["mAP@mean"], 4),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
