"""Rotated Task-Aligned label assigner (pure JAX, fixed shapes).

Rebuild of the assignment step ultralytics' OBB trainer uses
(SURVEY.md §2.2 "OBB loss / assigner"): for each GT, score anchors by
align = cls_score^alpha * ProbIoU^beta, restrict to anchors whose centers
lie inside the rotated GT box, take top-k, resolve multi-GT anchors by
highest IoU, and produce per-anchor targets (labels, rotated boxes, and
align-normalized score targets).

All GT dims are padded to a static `max_gt` with a validity mask, so the
assigner jits inside the training step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import geometry as G


def candidates_in_rotated_gts(anchor_pts: jnp.ndarray,
                              gt_xywhr: jnp.ndarray) -> jnp.ndarray:
    """[A, 2] anchor centers x [M, 5] rotated GT boxes -> [M, A] bool:
    anchor center inside the rotated rectangle.

    Uses the projection test: with corners a, b (= a + w-edge), d (= a +
    h-edge), point p is inside iff 0 <= ap.ab <= ab.ab and
    0 <= ap.ad <= ad.ad."""
    c8 = G.xywhr_to_corners8(gt_xywhr)       # [M, 8]
    pts = G.corners8_to_pts(c8)              # [M, 4, 2]
    a = pts[:, 1]                            # corner
    b = pts[:, 0]                            # a + h-edge
    d = pts[:, 2]                            # a + w-edge
    ab = b - a                               # [M, 2]
    ad = d - a
    ap = anchor_pts[None, :, :] - a[:, None, :]   # [M, A, 2]
    dot_ab = (ap * ab[:, None]).sum(-1)
    dot_ad = (ap * ad[:, None]).sum(-1)
    nab = (ab * ab).sum(-1)[:, None]
    nad = (ad * ad).sum(-1)[:, None]
    return (dot_ab >= 0) & (dot_ab <= nab) & (dot_ad >= 0) & (dot_ad <= nad)


@partial(jax.jit, static_argnames=("topk", "nc"))
def assign(
    pd_scores: jnp.ndarray,    # [B, A, nc] sigmoid cls scores
    pd_bboxes: jnp.ndarray,    # [B, A, 5] xywhr, same units as gt
    anchor_pts: jnp.ndarray,   # [A, 2] anchor centers (same units)
    gt_labels: jnp.ndarray,    # [B, M] int
    gt_bboxes: jnp.ndarray,    # [B, M, 5] xywhr
    gt_mask: jnp.ndarray,      # [B, M] bool validity
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
    nc: int = 12,
    eps: float = 1e-9,
):
    """Returns dict: target_labels [B,A], target_bboxes [B,A,5],
    target_scores [B,A,nc], fg_mask [B,A]."""

    def one(scores, boxes, labels, gts, mask):
        M, A = gts.shape[0], boxes.shape[0]

        in_gts = candidates_in_rotated_gts(anchor_pts, gts)      # [M, A]
        iou = G.probiou(gts[:, None, :], boxes[None, :, :])      # [M, A]
        iou = jnp.maximum(iou, 0.0)

        cls_score = scores[:, labels].T                          # [M, A]
        align = (cls_score ** alpha) * (iou ** beta)

        cand = in_gts & mask[:, None]
        metric = jnp.where(cand, align, 0.0)

        # top-k per GT by align metric among candidates
        kth = jax.lax.top_k(metric, topk)[0][:, -1:]             # [M, 1]
        topk_mask = cand & (metric >= jnp.maximum(kth, eps)) & (metric > 0)

        # resolve anchors claimed by multiple GTs: keep highest-IoU GT
        claimed = topk_mask.sum(0)                               # [A]
        iou_masked = jnp.where(topk_mask, iou, -1.0)
        best_gt = jnp.argmax(iou_masked, axis=0)                 # [A]
        onehot_best = jax.nn.one_hot(best_gt, M, dtype=bool,
                                     axis=0)                     # [M, A]
        final_mask = jnp.where(claimed[None, :] > 1,
                               topk_mask & onehot_best, topk_mask)

        fg = final_mask.any(0)                                   # [A]
        gt_idx = jnp.argmax(final_mask, axis=0)                  # [A]

        t_labels = labels[gt_idx]
        t_bboxes = gts[gt_idx]

        # normalized score targets: align * (max_iou / max_align) per GT
        metric_f = jnp.where(final_mask, align, 0.0)
        iou_f = jnp.where(final_mask, iou, 0.0)
        max_align = metric_f.max(axis=1, keepdims=True)          # [M, 1]
        max_iou = iou_f.max(axis=1, keepdims=True)
        norm = metric_f * max_iou / (max_align + eps)            # [M, A]
        score_val = norm.max(axis=0)                             # [A]

        t_scores = jax.nn.one_hot(t_labels, nc) * score_val[:, None]
        t_scores = jnp.where(fg[:, None], t_scores, 0.0)
        return {
            "labels": jnp.where(fg, t_labels, 0),
            "bboxes": t_bboxes,
            "scores": t_scores,
            "fg": fg,
        }

    return jax.vmap(one)(pd_scores, pd_bboxes, gt_labels, gt_bboxes,
                         gt_mask)
