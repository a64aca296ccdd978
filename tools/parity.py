"""Golden-output parity harness.

Compares a detection xlsx produced by this framework against the
reference's committed golden output (`Output/Test{1,2}.xlsx`) by greedy
exact-IoU matching of same-class detections, reporting match counts, IoU
distribution, confidence deltas and angle deltas.

Usage:
  python tools/parity.py OURS.xlsx GOLDEN.xlsx [--iou 0.5]

Full parity on the golden images additionally requires the reference's
fine-tuned weights (Google Drive, not bundled — README 'Parity status');
with converted weights, run the detect CLI on /root/reference/Input first.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from oriented_object_detection_tpu.config import CLASS_NAMES  # noqa: E402
from oriented_object_detection_tpu.infer.fusion import (  # noqa: E402
    exact_iou_matrix_host)
from oriented_object_detection_tpu.utils import xlsx  # noqa: E402

NAME_TO_ID = {v: k for k, v in CLASS_NAMES.items()}


def load_dets_xlsx(path: str) -> np.ndarray:
    rows = xlsx.read_xlsx(path)
    header, body = rows[0], rows[1:]
    assert header[:9] == ["Class", "X1", "Y1", "X2", "Y2", "X3", "Y3",
                          "X4", "Y4"], header
    out = []
    for r in body:
        if not r or r[0] is None:
            continue
        cls_id = NAME_TO_ID.get(r[0], -1)
        vals = [float(v) for v in r[1:11]]
        out.append([*vals[:8], cls_id, vals[8],
                    vals[9] if len(vals) > 9 else 0.0])
    return np.asarray(out, np.float64).reshape(-1, 11)


def compare(ours: np.ndarray, golden: np.ndarray, iou_thr: float = 0.5):
    iou = exact_iou_matrix_host(ours[:, :8], golden[:, :8])
    used = np.zeros(len(golden), bool)
    matches = []
    for i in np.argsort(-ours[:, 9], kind="stable"):
        best_j, best = -1, 0.0
        for j in range(len(golden)):
            if used[j] or ours[i, 8] != golden[j, 8]:
                continue
            if iou[i, j] > best:
                best, best_j = iou[i, j], j
        if best >= iou_thr:
            used[best_j] = True
            matches.append((i, best_j, best))
    return matches, used


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("ours")
    p.add_argument("golden")
    p.add_argument("--iou", type=float, default=0.5)
    args = p.parse_args(argv)

    ours = load_dets_xlsx(args.ours)
    golden = load_dets_xlsx(args.golden)
    matches, used = compare(ours, golden, args.iou)

    print(f"ours: {len(ours)} dets | golden: {len(golden)} dets | "
          f"matched @IoU>={args.iou}: {len(matches)}")
    if matches:
        ious = [m[2] for m in matches]
        dconf = [abs(ours[i, 9] - golden[j, 9]) for i, j, _ in matches]
        dang = [abs(ours[i, 10] - golden[j, 10]) for i, j, _ in matches]
        print(f"match IoU: mean={np.mean(ious):.4f} min={np.min(ious):.4f}")
        print(f"|dconf|:  mean={np.mean(dconf):.4f} max={np.max(dconf):.4f}")
        print(f"|dangle|: mean={np.mean(dang):.3f} max={np.max(dang):.3f}")
    miss = len(golden) - len(matches)
    extra = len(ours) - len(matches)
    print(f"missed golden: {miss} | extra ours: {extra}")
    return 0 if (miss == 0 and extra == 0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
