"""Complete end-to-end system demo on synthetic data.

Mirrors the reference's full workflow with no external weights:
  1. generate GeoMap-like synthetic maps (train/val/Input splits),
  2. train BOTH scale models (tile 128/ov30 and 416/ov100) through the
     CLI (dataset build + balancing + mosaic + TAL training + val mAP),
  3. run dual-scale tiled detection with consensus fusion + the full
     metrics suite (`detect --metrics`) on the held-out Input maps,
printing the reference-style report block (P/R/F1, class-wise xlsx,
center-hit, mAP@0.5, mAP@[0.5:0.95], soft mAP).

Usage: python tools/e2e_synthetic.py [--epochs 12] [--scale n]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--scale", default="n")
    p.add_argument("--root", default="runs/e2e_synth")
    p.add_argument("--channels", type=int, default=3, choices=(3, 4),
                   help="4 = DT-Edge 4ch variant: trains/detects the 416 "
                        "scale only, like the reference's best416_4ch "
                        "config (README.md:102-108)")
    args = p.parse_args(argv)

    import cv2

    from oriented_object_detection_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()

    from oriented_object_detection_tpu.data import labels as L
    from tools.train_synthetic import gen_map

    root = args.root
    rng = np.random.RandomState(7)
    for split, n in (("train", 8), ("val", 2)):
        os.makedirs(f"{root}/images/{split}", exist_ok=True)
        os.makedirs(f"{root}/labels/{split}", exist_ok=True)
        for k in range(n):
            img, lab = gen_map(rng, H=512, W=512)
            cv2.imwrite(f"{root}/images/{split}/m{k}.png", img)
            L.write_labels(f"{root}/labels/{split}/m{k}.txt", lab)
    # held-out Input maps with golden-image-like sizes + labels for eval
    os.makedirs(f"{root}/Input", exist_ok=True)
    for k, (H, W) in enumerate(((807, 895), (1028, 1056))):
        img, lab = gen_map(rng, H=H, W=W, n_obj=40)
        cv2.imwrite(f"{root}/Input/test{k}.png", img)
        L.write_labels(f"{root}/Input/test{k}.txt", lab)

    from oriented_object_detection_tpu.cli import main as cli_main

    ch = args.channels
    suffix = "_4ch" if ch == 4 else ""
    # 4ch mirrors the reference's single 4ch config (tile 416 only; the
    # reference's APPLY_FILTERED_RGB path builds one cropped4/ dataset)
    # reference geometry exactly: 128/ov30 + 416/ov100
    # (`Detect_OBB.py:24-25`; r02 trained 128 at ov32 — VERDICT #8)
    geoms = ((416, 100),) if ch == 4 else ((128, 30), (416, 100))
    for ts, ov in geoms:
        ck = f"{root}/run{ts}{suffix}"
        if not os.path.exists(f"{ck}/best.ckpt"):
            print(f"=== training tile {ts} ({ch}ch) ===", flush=True)
            argv_train = [
                "train", "--data-root", root, "--tile-size", str(ts),
                "--overlap", str(ov), "--epochs", str(args.epochs),
                "--batch-size", "16", "--scale", args.scale,
                "--channels", str(ch), "--ckpt-dir", ck,
            ]
            # a completed build leaves the list file; re-running the
            # builder on a populated crop dir would re-augment the
            # already-augmented tiles (compounding _aug_ files)
            if os.path.exists(f"{root}/train_cropped{ts}.txt"):
                argv_train.append("--skip-cropping")
            cli_main(argv_train)

    print(f"=== detection + metrics ({ch}ch) ===", flush=True)
    if ch == 4:
        cli_main([
            "detect", "--input", f"{root}/Input",
            "--output", f"{root}/Output4ch",
            "--scales", f"416:100={root}/run416_4ch/best.ckpt",
            "--channels", "4",
            "--scale", args.scale, "--metrics", "--batch",
        ])
    else:
        cli_main([
            "detect", "--input", f"{root}/Input",
            "--output", f"{root}/Output",
            "--ckpt128", f"{root}/run128/best.ckpt",
            "--ckpt416", f"{root}/run416/best.ckpt",
            "--scale", args.scale, "--metrics", "--batch",
        ])


if __name__ == "__main__":
    main()
