"""Run the data+train+eval stack on the REAL GeoMap label corpus.

The reference bundles its actual dataset labels (73 train + 9 val files,
11,792 boxes, class 1 "Strike" 8,593 vs class 7 "Bergsturz" 9) at
`/root/reference/datasets/GeoMap/labels/` with list conventions in
`train.txt`/`val.txt` — but NOT the scanned map images (external). This
tool renders synthetic imagery UNDER THE REAL LABEL GEOMETRY so the
pipeline components whose reason-to-exist is the real distribution
finally run against it (VERDICT r04 #2):

  * C4 train tiler / C6 val tiler at real per-map density,
  * C8 class balancer at the real 7,990-vs-7 train imbalance
    (threshold 800, `Train_OBB.py:513-576`),
  * C5 R_TARGET empty budget (`Train_OBB.py:717-726`),
  * a bounded training run + the full metric block on the real val
    labels.

Imagery: per-map size S chosen so the median symbol edge is ~22 px
(real scans put strike symbols at tens of px), textured background +
clutter polylines + per-class colored quads at the exact label corners.

Phases (composable):
  python tools/geomap_real.py --render            # imagery + layout
  python tools/geomap_real.py --build             # tiling + balance
  python tools/geomap_real.py --train --epochs 24 # bounded TPU train
  python tools/geomap_real.py --eval              # detect val maps + metrics
Artifacts: geomap_real_r05.json at the repo root (committed record).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, ".")

REF = "/root/reference/datasets/GeoMap"
WORK_DEFAULT = "/tmp/geomap_real"
OUT_JSON = "geomap_real_r05.json"
TARGET_EDGE_PX = 22.0


def _read_label_file(path):
    rows = []
    for ln in open(path):
        p = ln.split()
        if len(p) >= 9:
            rows.append([float(v) for v in p[:9]])
    return np.asarray(rows, np.float64).reshape(-1, 9)


def _pick_size(lab: np.ndarray) -> int:
    """Map size so the median symbol edge lands near TARGET_EDGE_PX."""
    if not len(lab):
        return 2048
    a = lab[:, 1:9]
    e1 = np.hypot(a[:, 2] - a[:, 0], a[:, 3] - a[:, 1])
    e2 = np.hypot(a[:, 4] - a[:, 2], a[:, 5] - a[:, 3])
    med = float(np.median(np.maximum(e1, e2)))
    if med <= 0:
        return 2048
    s = TARGET_EDGE_PX / med
    return int(np.clip(round(s / 32) * 32, 1024, 4096))


def render_map(lab: np.ndarray, S: int, rng: np.random.RandomState):
    """Textured map sheet with clutter + class-colored quads at the real
    label corners (same drawing idiom as tools/train_synthetic.gen_map,
    geometry from the corpus instead of random)."""
    import cv2

    from oriented_object_detection_tpu.config import CLASS_COLORS

    img = np.full((S, S, 3), 232, np.uint8)
    img = cv2.subtract(img, rng.randint(0, 35, (S, S, 3)).astype(np.uint8))
    # map clutter: contour-ish faint polylines that match no class color
    for _ in range(30):
        n = rng.randint(3, 8)
        pts = rng.randint(0, S, (n, 2)).astype(np.int32)
        cv2.polylines(img, [pts.reshape(-1, 1, 2)], False,
                      (180, 180, 180), rng.randint(1, 3))
    for row in lab:
        cls = int(row[0])
        pts = (row[1:9].reshape(4, 2) * S).round().astype(np.int32)
        color = tuple(int(c) for c in CLASS_COLORS.get(cls, (0, 0, 0)))
        cv2.fillPoly(img, [pts.reshape(-1, 1, 2)], color)
    return img


def phase_render(work: str, seed: int = 5):
    import cv2

    rng = np.random.RandomState(seed)
    report = {}
    for split in ("train", "val"):
        img_dir = f"{work}/images/{split}"
        lbl_dir = f"{work}/labels/{split}"
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(lbl_dir, exist_ok=True)
        # list-file conventions: stems come from train.txt/val.txt
        listed = [ln.strip() for ln in open(f"{REF}/{split}.txt")
                  if ln.strip()]
        sizes = []
        for entry in listed:
            stem = os.path.splitext(os.path.basename(entry))[0]
            lab = _read_label_file(f"{REF}/labels/{split}/{stem}.txt")
            S = _pick_size(lab)
            sizes.append(S)
            img = render_map(lab, S, rng)
            cv2.imwrite(f"{img_dir}/{stem}.jpg", img,
                        [cv2.IMWRITE_JPEG_QUALITY, 92])
            # labels copied VERBATIM from the reference corpus
            with open(f"{REF}/labels/{split}/{stem}.txt") as f:
                open(f"{lbl_dir}/{stem}.txt", "w").write(f.read())
        report[split] = {"n_maps": len(listed),
                         "sizes_px": [int(s) for s in sizes]}
        print(f"[RENDER] {split}: {len(listed)} maps, "
              f"S in [{min(sizes)}, {max(sizes)}]")
    return report


def class_counts(label_dir: str) -> dict:
    from collections import Counter

    c: "Counter" = Counter()
    for f in glob.glob(f"{label_dir}/*.txt"):
        lab = _read_label_file(f)
        for cls in lab[:, 0].astype(int) if len(lab) else []:
            c[int(cls)] += 1
    return dict(sorted(c.items()))


def phase_build(work: str, ts: int, overlap: int):
    """C4 -> C8 -> C5 -> C6 on the real label geometry (the exact
    `oodt train` dataset-build flow, run standalone for the record)."""
    from oriented_object_detection_tpu.config import TrainConfig
    from oriented_object_detection_tpu.data import dataset as DS

    cfg = TrainConfig(tile_size=ts, overlap=overlap)
    dirs = {
        "img": f"{work}/images/train", "lbl": f"{work}/labels/train",
        "oimg": f"{work}/cropped{ts}/images/train",
        "olbl": f"{work}/cropped{ts}/labels/train",
        "vimg": f"{work}/images/val", "vlbl": f"{work}/labels/val",
        "voimg": f"{work}/cropped{ts}/images/val",
        "volbl": f"{work}/cropped{ts}/labels/val",
    }
    train_list = f"{work}/train_cropped{ts}.txt"
    val_list = f"{work}/val_cropped{ts}.txt"

    t0 = time.time()
    stats = DS.build_train_tiles(
        dirs["img"], dirs["lbl"], dirs["oimg"], dirs["olbl"],
        train_list, ts, overlap, cfg.object_boundary_threshold)
    before = class_counts(dirs["olbl"])
    DS.balance_classes(dirs["oimg"], dirs["olbl"], train_list,
                       cfg.class_balance_threshold,
                       cfg.augmentation_repeats, seed=cfg.seed)
    after = class_counts(dirs["olbl"])
    P_post = DS.count_positives(dirs["olbl"])
    E_total = stats["E_total"]
    frac = min(1.0, cfg.r_target * P_post / E_total) if E_total else 0.0
    empty = DS.save_selected_empty_tiles(stats["empty_meta_path"], frac,
                                         train_list, rng_seed=cfg.seed)
    val_stats = DS.build_val_tiles(
        dirs["vimg"], dirs["vlbl"], dirs["voimg"], dirs["volbl"],
        val_list, ts, overlap,
        boundary_threshold=cfg.object_boundary_threshold,
        r_target=cfg.r_target)
    return {
        "tile_size": ts, "overlap": overlap,
        "P_total": stats["P_total"], "E_total": E_total,
        "keep_fraction": round(frac, 4), "E_kept": empty.get("E_kept"),
        "balance_before": before, "balance_after": after,
        "val_stats": val_stats, "build_seconds": round(time.time() - t0, 1),
    }


def phase_train(work: str, ts: int, overlap: int, epochs: int,
                scale: str, batch_size: int):
    cmd = [sys.executable, "-u", "-m",
           "oriented_object_detection_tpu.cli", "train",
           "--data-root", work, "--tile-size", str(ts),
           "--overlap", str(overlap), "--epochs", str(epochs),
           "--batch-size", str(batch_size), "--scale", scale,
           "--skip-cropping",  # dataset already built by phase_build
           "--ckpt-dir", f"{work}/run{ts}"]
    print("[TRAIN]", " ".join(cmd))
    t0 = time.time()
    rc = subprocess.call(cmd, cwd=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    out = {"rc": rc, "train_seconds": round(time.time() - t0, 1),
           "epochs": epochs, "scale": scale, "batch_size": batch_size}
    csv = f"{work}/run{ts}/results.csv"
    if os.path.exists(csv):
        lines = [ln.strip() for ln in open(csv) if ln.strip()]
        out["results_head"] = lines[0]
        out["results_tail"] = lines[-3:]
    return out


def phase_eval(work: str, ts: int, overlap: int, scale: str):
    """Detect on the rendered val maps; metric block vs the REAL val
    labels (run_fusion_eval semantics through the CLI --metrics path)."""
    import re
    import shutil

    # GT discovery follows the reference convention (C20): label txt
    # next to the image — copy the real val labels alongside the
    # rendered maps
    for lf in glob.glob(f"{work}/labels/val/*.txt"):
        shutil.copy(lf, f"{work}/images/val/")

    out_dir = f"{work}/eval_out"
    cmd = [sys.executable, "-u", "-m",
           "oriented_object_detection_tpu.cli", "detect",
           "--input", f"{work}/images/val",
           "--output", out_dir,
           "--scales", f"{ts}:{overlap}={work}/run{ts}/best.ckpt",
           "--scale", scale, "--metrics", "--batch"]
    print("[EVAL]", " ".join(cmd))
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    sys.stdout.write(p.stdout[-4000:])
    if p.returncode:
        sys.stderr.write(p.stderr[-4000:])
    metrics = {}
    for pat, key in [
            (r"Precision:\s*([0-9.]+)", "precision"),
            (r"Recall:\s*([0-9.]+)", "recall"),
            (r"F1[- ]?[Ss]core:\s*([0-9.]+)", "f1"),
            (r"mAP@0\.5:\s*([0-9.]+)", "mAP@0.5"),
            (r"mAP@\[0\.5:0\.95\]:\s*([0-9.]+)", "mAP@[0.5:0.95]"),
            (r"mAP@0\.3:\s*([0-9.]+)", "soft_mAP@0.3"),
            (r"mAP@\[0\.3:0\.7\]:\s*([0-9.]+)", "soft_mAP@[0.3:0.7]")]:
        m = re.search(pat, p.stdout)
        if m:
            metrics[key] = float(m.group(1))
    metrics["rc"] = p.returncode
    metrics["eval_seconds"] = round(time.time() - t0, 1)
    return metrics


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default=WORK_DEFAULT)
    ap.add_argument("--tile-size", type=int, default=416)
    ap.add_argument("--overlap", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--scale", default="n")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--render", action="store_true")
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args(argv)
    if args.all:
        args.render = args.build = args.train = args.eval = True

    rec = {}
    if os.path.exists(OUT_JSON):
        rec = json.load(open(OUT_JSON))
    rec.setdefault("source_labels", REF)
    rec["source_counts"] = {
        "train": class_counts(f"{REF}/labels/train"),
        "val": class_counts(f"{REF}/labels/val")}

    if args.render:
        rec["render"] = phase_render(args.work)
    if args.build:
        rec["build"] = phase_build(args.work, args.tile_size,
                                   args.overlap)
    if args.train:
        rec["train"] = phase_train(args.work, args.tile_size,
                                   args.overlap, args.epochs,
                                   args.scale, args.batch_size)
    if args.eval:
        rec["eval"] = phase_eval(args.work, args.tile_size,
                                 args.overlap, args.scale)

    with open(OUT_JSON, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"[DONE] wrote {OUT_JSON}")


if __name__ == "__main__":
    main()
