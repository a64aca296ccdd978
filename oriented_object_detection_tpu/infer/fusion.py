"""Global merge + cross-scale consensus late fusion.

Host-side orchestration (runs once per image over at most a few hundred
detections) with all IoU computation batched onto the device through the
exact quad-IoU kernel. The sequential greedy semantics of the reference are
preserved bit-for-bit:

* `merge_detections` (`Detect_OBB.py:176-200`): confidence-descending greedy
  class-aware suppression at exact polygon IoU >= threshold, output in
  confidence-descending order.
* `cross_scale_consensus_filter` (`Detect_OBB.py:347-423`): drop detections
  below CONS_LOW, then pair each unvisited detection with its best
  same-class partner in the other scales (highest confidence, ties broken by
  IoU, partner IoU >= CONS_IOU_PARTNER); keep the stronger of the pair, or a
  solo detection only when its confidence >= CONS_HIGH.

Detections are [N, 11] float arrays: (x1..y4, cls_id, conf, angle), the same
tuple layout the reference uses.
"""

from __future__ import annotations

import numpy as np

from ..ops import geometry as G

CONS_IOU_PARTNER = 0.40
CONS_LOW = 0.25
CONS_HIGH = 0.70

DET_WIDTH = 11  # x1..y4 (8), cls, conf, angle


def _pad_to_bucket(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def exact_iou_matrix_host(c8a: np.ndarray, c8b: np.ndarray) -> np.ndarray:
    """Exact pairwise quad IoU for host code.

    Prefers the native C++ library (double precision, no device round-trip
    or shape-bucket recompiles); falls back to a bucketed device call."""
    na, nb = len(c8a), len(c8b)
    if na == 0 or nb == 0:
        return np.zeros((na, nb), dtype=np.float64)

    from ..utils import native

    m = native.quad_iou_matrix(np.asarray(c8a), np.asarray(c8b))
    if m is not None:
        return m

    import jax.numpy as jnp

    pa, pb = _pad_to_bucket(na), _pad_to_bucket(nb)
    qa = np.zeros((pa, 8), dtype=np.float64)
    qb = np.zeros((pb, 8), dtype=np.float64)
    qa[:na] = c8a
    qb[:nb] = c8b
    m = np.asarray(G.quad_iou_matrix(jnp.asarray(qa), jnp.asarray(qb)))
    return m[:na, :nb]


def merge_detections(dets: np.ndarray, iou_threshold: float = 0.4,
                     iou: np.ndarray | None = None) -> np.ndarray:
    """Greedy class-aware merge; returns kept dets in conf-descending order.

    `iou` may pass a precomputed [N, N] exact IoU matrix to avoid
    recomputation.
    """
    dets = np.asarray(dets, dtype=np.float64).reshape(-1, DET_WIDTH)
    n = len(dets)
    if n == 0:
        return dets
    if iou is None:
        from ..utils import native

        keep = native.greedy_nms(dets, float(iou_threshold))
        if keep is not None:
            return dets[keep]
        iou = exact_iou_matrix_host(dets[:, :8], dets[:, :8])

    # stable conf-descending order (ties keep input order, like list.sort)
    order = np.argsort(-dets[:, 9], kind="stable")
    keep_idx: list[int] = []
    for i in order:
        ok = True
        for j in keep_idx:
            if dets[i, 8] == dets[j, 8] and iou[i, j] >= iou_threshold:
                ok = False
                break
        if ok:
            keep_idx.append(i)
    return dets[keep_idx]


def cross_scale_consensus_filter(
    dets_by_scale: dict[int, np.ndarray],
) -> np.ndarray:
    """Dual/multi-scale consensus late fusion, reference semantics
    (`Detect_OBB.py:347-423`). Returns kept dets in discovery order."""
    scales = sorted(dets_by_scale.keys())
    as_arr = {
        s: np.asarray(dets_by_scale[s], dtype=np.float64).reshape(
            -1, DET_WIDTH)
        for s in scales
    }
    if len(scales) == 1:
        return as_arr[scales[0]]

    # conf >= CONS_LOW filter per scale
    filt = {s: a[a[:, 9] >= CONS_LOW] for s, a in as_arr.items()}

    # native path: the whole sequential walk in one C++ call (AABB
    # prescreen + on-demand exact IoU) — the Python walk below is its
    # bit-exact mirror and the fallback when the library is missing
    from ..utils import native

    rows = (np.concatenate([filt[s] for s in scales])
            if any(len(filt[s]) for s in scales)
            else np.zeros((0, DET_WIDTH)))
    scale_of = np.concatenate(
        [np.full(len(filt[s]), si, np.int32)
         for si, s in enumerate(scales)]) if len(rows) else \
        np.zeros((0,), np.int32)
    keep = native.consensus_filter(rows, scale_of, CONS_IOU_PARTNER,
                                   CONS_LOW, CONS_HIGH)
    if keep is not None:
        return (rows[keep] if len(keep)
                else np.zeros((0, DET_WIDTH), dtype=np.float64))

    # one concatenated exact-IoU matrix across all scales (`rows` above
    # is the same concatenation the native path used)
    offsets = np.cumsum([0] + [len(filt[s]) for s in scales])
    iou_all = exact_iou_matrix_host(rows[:, :8], rows[:, :8])

    def off(s):
        return offsets[scales.index(s)]

    visited = {s: np.zeros(len(filt[s]), dtype=bool) for s in scales}
    kept: list[np.ndarray] = []

    flat = [(s, i) for s in scales for i in range(len(filt[s]))]
    others = {s: [t for t in scales if t != s] for s in scales}

    for s, i in flat:
        if visited[s][i]:
            continue
        d = filt[s][i]
        cls_d, conf_d = int(d[8]), float(d[9])

        best = None  # (t, j)
        best_conf = -1.0
        best_iou = 0.0
        for t in others[s]:
            pool = filt[t]
            for j in range(len(pool)):
                if visited[t][j] or int(pool[j, 8]) != cls_d:
                    continue
                iou = iou_all[off(s) + i, off(t) + j]
                if iou >= CONS_IOU_PARTNER:
                    conf_p = float(pool[j, 9])
                    if (conf_p > best_conf) or (
                        conf_p == best_conf and iou > best_iou
                    ):
                        best = (t, j)
                        best_conf = conf_p
                        best_iou = iou

        if best is None or best_conf < CONS_LOW:
            if conf_d >= CONS_HIGH:
                kept.append(d)
            visited[s][i] = True
            continue

        t, j = best
        if conf_d >= best_conf:
            kept.append(d)
        else:
            kept.append(filt[t][j])
        visited[s][i] = True
        visited[t][j] = True

    return (np.stack(kept) if kept
            else np.zeros((0, DET_WIDTH), dtype=np.float64))
