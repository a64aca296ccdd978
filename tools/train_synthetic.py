"""End-to-end training validation on a synthetic oriented-shapes dataset.

Generates GeoMap-like maps (textured background + oriented colored
rectangles, one color family per class), runs the FULL pipeline — tiling
dataset build, class balancing, loader with mosaic, TAL/ProbIoU training,
EMA, val mAP fitness — and reports the final val mAP@0.5. A healthy stack
reaches high mAP quickly; this catches assigner/loss/decode logic errors
that unit tests cannot.

Usage: python tools/train_synthetic.py [--epochs 30] [--scale n]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")

CLASS_COLORS = [
    (200, 40, 40), (40, 200, 40), (40, 40, 200), (200, 200, 40),
    (200, 40, 200), (40, 200, 200),
]


def draw_obb(img, cx, cy, w, h, theta, color):
    import cv2

    pts = []
    for sx, sy in ((1, 1), (1, -1), (-1, -1), (-1, 1)):
        x = cx + sx * w / 2 * np.cos(theta) - sy * h / 2 * np.sin(theta)
        y = cy + sx * w / 2 * np.sin(theta) + sy * h / 2 * np.cos(theta)
        pts.append((x, y))
    cv2.fillPoly(img, [np.array(pts, np.int32)], color)
    return np.array(pts).reshape(-1)


def gen_map(rng, H=512, W=512, n_obj=24, nc=6):
    import cv2

    img = np.full((H, W, 3), 230, np.uint8)
    noise = rng.randint(0, 40, (H, W, 3)).astype(np.uint8)
    img = cv2.subtract(img, noise)
    labels = []
    for _ in range(n_obj):
        cls = rng.randint(0, nc)
        cx, cy = rng.uniform(30, W - 30), rng.uniform(30, H - 30)
        w, h = rng.uniform(18, 40), rng.uniform(10, 22)
        th = rng.uniform(-np.pi, np.pi)
        c8 = draw_obb(img, cx, cy, w, h, th, CLASS_COLORS[cls])
        n8 = c8.copy()
        n8[0::2] /= W
        n8[1::2] /= H
        if (n8 >= 0).all() and (n8 <= 1).all():
            labels.append([cls] + list(n8))
    return img, np.asarray(labels)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--scale", default="n")
    p.add_argument("--tile-size", type=int, default=128)
    p.add_argument("--maps", type=int, default=8)
    p.add_argument("--root", default=None)
    args = p.parse_args(argv)

    import cv2

    from oriented_object_detection_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()

    from oriented_object_detection_tpu.data import dataset as DS
    from oriented_object_detection_tpu.data import labels as L

    root = args.root or tempfile.mkdtemp(prefix="synth_obb_")
    rng = np.random.RandomState(0)
    for split, n in (("train", args.maps), ("val", 2)):
        os.makedirs(f"{root}/images/{split}", exist_ok=True)
        os.makedirs(f"{root}/labels/{split}", exist_ok=True)
        for k in range(n):
            img, lab = gen_map(rng)
            cv2.imwrite(f"{root}/images/{split}/m{k}.png", img)
            L.write_labels(f"{root}/labels/{split}/m{k}.txt", lab)

    import jax

    from oriented_object_detection_tpu.cli import main as cli_main

    ckpt_dir = f"{root}/run"
    cli_main([
        "train", "--data-root", root,
        "--tile-size", str(args.tile_size), "--overlap", "32",
        "--epochs", str(args.epochs), "--batch-size", "16",
        "--scale", args.scale, "--ckpt-dir", ckpt_dir,
    ])

    # final fitness from the results csv
    import csv

    with open(os.path.join(ckpt_dir, "results.csv")) as f:
        rows = list(csv.DictReader(f))
    fits = [float(r["fitness"]) for r in rows]
    print(json.dumps({
        "metric": "synthetic-shapes val mAP@0.5 after "
                  f"{len(rows)} epochs (scale {args.scale})",
        "value": round(max(fits), 4),
        "final": round(fits[-1], 4),
        "unit": "mAP@0.5",
        "root": root,
    }))


if __name__ == "__main__":
    main()
