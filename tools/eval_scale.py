"""Dataset-scale evaluation benchmark (VERDICT r02 #5).

The reference's real dataset implies 11,792 GT boxes over 73+9 label
files with a heavily skewed class distribution (SURVEY.md C27). This
tool times the full eval suite (`Detect_OBB.py:650-740` semantics) at
that scale WITHOUT needing the TPU: it synthesizes ~100 maps' worth of
GT with the reference's class skew and a realistic detection set
(jittered copies of GT at varied confidences + low-conf false
positives, ~wide-set density), then times each stage:

    evaluate_dataset (P/R/F1)  |  classwise_report  |  center-hit
    evaluate_map @ [0.5:0.95] (10 IoUs)  |  soft mAP (5 IoUs)

Host-only (numpy + native C++ IoU); run with JAX_PLATFORMS anything.

Usage: python tools/eval_scale.py [--images 100] [--out eval_scale.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

# reference class skew (C27): Strike dominates, Bergsturz nearly absent
CLASS_WEIGHTS = {0: 900, 1: 8593, 2: 350, 3: 300, 4: 250, 5: 400,
                 6: 200, 7: 9, 8: 180, 9: 160, 10: 250, 11: 200}


def synth_gt(rng, n_boxes: int, H: int, W: int) -> np.ndarray:
    """[M, 9] (cls, x1..y4 px) rotated-rect GT rows."""
    cids = rng.choice(list(CLASS_WEIGHTS), size=n_boxes,
                      p=np.array(list(CLASS_WEIGHTS.values()), float)
                      / sum(CLASS_WEIGHTS.values()))
    cx = rng.uniform(30, W - 30, n_boxes)
    cy = rng.uniform(30, H - 30, n_boxes)
    w = rng.uniform(10, 40, n_boxes)
    h = rng.uniform(10, 40, n_boxes)
    th = rng.uniform(0, np.pi, n_boxes)
    ct, st = np.cos(th), np.sin(th)
    dx = np.stack([-w, w, w, -w], 1) / 2
    dy = np.stack([-h, -h, h, h], 1) / 2
    xs = cx[:, None] + dx * ct[:, None] - dy * st[:, None]
    ys = cy[:, None] + dx * st[:, None] + dy * ct[:, None]
    out = np.zeros((n_boxes, 9))
    out[:, 0] = cids
    out[:, 1::2] = xs
    out[:, 2::2] = ys
    return out


def synth_dets(rng, gt: np.ndarray, extra_fp: float = 0.5) -> np.ndarray:
    """[N, 11] det rows: jittered GT (conf ~ U(0.3, 1)) + misses +
    low-conf FPs (conf ~ U(0.001, 0.3)) — the wide pre-consensus set
    evaluate_map consumes."""
    keep = rng.rand(len(gt)) < 0.9
    base = gt[keep]
    jit = base[:, 1:] + rng.normal(0, 2.0, (len(base), 8))
    conf = rng.uniform(0.3, 1.0, len(base))
    rows = [np.concatenate([
        jit, base[:, :1], conf[:, None],
        np.zeros((len(base), 1))], axis=1)]
    n_fp = int(len(gt) * extra_fp)
    fp = synth_gt(rng, n_fp, 1200, 1200)
    rows.append(np.concatenate([
        fp[:, 1:], fp[:, :1],
        rng.uniform(0.001, 0.3, n_fp)[:, None],
        np.zeros((n_fp, 1))], axis=1))
    return np.concatenate(rows)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=100)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from oriented_object_detection_tpu.eval import metrics as M

    rng = np.random.RandomState(0)
    total_gt = 11792          # C27 scale
    per_img = total_gt // args.images
    gts, dets = {}, {}
    for k in range(args.images):
        img = f"synthetic/map{k:03d}.png"
        gts[img] = synth_gt(rng, per_img, 1200, 1200)
        dets[img] = synth_dets(rng, gts[img])
    images = sorted(gts)
    n_dets = sum(len(v) for v in dets.values())
    print(f"[eval_scale] {args.images} images, "
          f"{sum(len(v) for v in gts.values())} GT boxes, "
          f"{n_dets} detections")

    cache = M.GTCache(loader=lambda img: gts[img])
    timings = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        print(f"  {name}: {timings[name]:.3f} s")
        return out

    # IoU matrices are memoized in the cache; time their one-time build
    # separately so the stage times show the matcher cost, as deployed
    timed("iou_matrices (one-time, native C++)",
          lambda: [cache.iou(dets[i], i) for i in images])
    timed("evaluate_dataset P/R/F1",
          lambda: M.evaluate_dataset(dets, images, cache,
                                     conf_thr=0.25, iou_thr=0.25))
    timed("classwise_report (12 classes)",
          lambda: M.classwise_report(dets, images, cache,
                                     conf_thr=0.25, iou_thr=0.25))
    timed("center_hit",
          lambda: M.evaluate_center_hit(dets, images, cache,
                                        conf_thr=0.25))
    maps = timed("evaluate_map [0.5:0.95] (10 IoUs)",
                 lambda: M.evaluate_map(
                     dets, images, list(np.arange(0.5, 0.96, 0.05)),
                     cache))
    timed("evaluate_map soft [0.3:0.7] (5 IoUs)",
          lambda: M.evaluate_map(
              dets, images, [0.3, 0.4, 0.5, 0.6, 0.7], cache))
    print(f"  (mAP@0.5 on synthetic jitter = {maps['mAP@0.5']:.3f})")
    total = round(sum(timings.values()), 3)
    print(f"[eval_scale] total {total:.3f} s")
    result = {"images": args.images, "gt_boxes": total_gt,
              "detections": n_dets, "timings_s": timings,
              "total_s": total}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    main()
