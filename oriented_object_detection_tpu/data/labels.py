"""YOLO-OBB label file IO (host side).

Tolerant 9-column reader matching `read_labels_or_empty`
(`Train_OBB.py:228-261`): whitespace-separated `cls x1 y1 x2 y2 x3 y3 x4 y4`
normalized rows; missing/zero-byte/malformed files and bad lines are
skipped; '#' comments honored; optional denormalization to pixels.
Writer mirrors the space-separated no-header format the reference's
DataFrame.to_csv produces.
"""

from __future__ import annotations

import os

import numpy as np


def read_labels(label_path: str, img_w: int | None = None,
                img_h: int | None = None, strict: bool = False) -> np.ndarray:
    """Returns [N, 9] float64 (cls, x1..y4). Normalized unless img_w/img_h
    given (then x/y are denormalized to pixels). Empty [0, 9] on any
    problem.

    strict=False mirrors the train-side pandas reader
    (`Train_OBB.py:228-261`): '#' comments honored, rows with >9 fields
    truncated to the first 9, rows with <9 skipped. strict=True mirrors the
    eval GT parser (`Detect_OBB.py:436-454`): a line must have EXACTLY 9
    whitespace fields (no comment stripping) or it is skipped — the two
    reference parsers genuinely differ and metrics parity needs both."""
    empty = np.zeros((0, 9), dtype=np.float64)
    if (not os.path.exists(label_path)
            or os.path.getsize(label_path) == 0):
        return empty
    rows = []
    try:
        with open(label_path, "r") as f:
            for line in f:
                if not strict:
                    line = line.split("#", 1)[0]
                line = line.strip()
                if not line:
                    continue
                parts = line.split()
                if (len(parts) != 9) if strict else (len(parts) < 9):
                    continue
                try:
                    vals = [float(p) for p in parts[:9]]
                except ValueError:
                    continue
                rows.append(vals)
    except OSError:
        return empty
    if not rows:
        return empty
    out = np.asarray(rows, dtype=np.float64)
    if img_w is not None:
        out[:, 1::2] *= float(img_w)
        out[:, 2::2] *= float(img_h)
    return out


def write_labels(label_path: str, labels: np.ndarray) -> None:
    """Space-separated rows, no header; empty array -> empty file
    (positive/empty tile convention, `Train_OBB.py:216-218, 417-420`)."""
    with open(label_path, "w") as f:
        for row in np.asarray(labels).reshape(-1, 9):
            f.write(" ".join(_fmt(v) for v in row) + "\n")


def _fmt(v: float) -> str:
    if float(v).is_integer():
        return str(int(v))
    return repr(float(v))


def label_path_for_image(image_path: str) -> str | None:
    """Label lookup next to the image or in a Labels/ subdir
    (`Detect_OBB.py:425-434`)."""
    base = os.path.splitext(os.path.basename(image_path))[0] + ".txt"
    cand1 = os.path.join(os.path.dirname(image_path), base)
    if os.path.exists(cand1):
        return cand1
    cand2 = os.path.join(os.path.dirname(image_path), "Labels", base)
    if os.path.exists(cand2):
        return cand2
    return None


def load_gt_as_pixels(image_path: str) -> np.ndarray:
    """GT for evaluation: [N, 9] (cls, corners in pixels) using the image's
    own size (`Detect_OBB.py:436-454`). Requires the image to be readable."""
    import cv2

    lp = label_path_for_image(image_path)
    if lp is None:
        return np.zeros((0, 9), dtype=np.float64)
    img = cv2.imread(image_path)
    if img is None:
        return np.zeros((0, 9), dtype=np.float64)
    h, w = img.shape[:2]
    return read_labels(lp, img_w=w, img_h=h, strict=True)
