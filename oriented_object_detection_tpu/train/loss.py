"""OBB training loss: rotated TAL assignment + ProbIoU + DFL + BCE.

Rebuild of the ultralytics v8 OBB loss the reference trains with
(`Train_OBB.py:796-841` -> engine internals, SURVEY.md §2.2): predictions
are decoded to rotated boxes in grid units, assigned in pixel units via the
rotated Task-Aligned assigner, and scored with

  * BCE on align-normalized class score targets (sum / target score sum),
  * (1 - ProbIoU) on matched rotated boxes, weighted by score targets,
  * DFL cross-entropy on the axis-aligned ltrb bin distribution (the angle
    contributes through ProbIoU only — no separate angle loss term),

with gains box=7.5, cls=0.5, dfl=1.5 and the batch-size scaling the engine
applies.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

import optax

from ..models import decode as D
from ..ops import geometry as G
from . import assigner


class LossConfig(NamedTuple):
    nc: int = 12
    reg_max: int = 16
    img_size: int = 416
    box_gain: float = 7.5
    cls_gain: float = 0.5
    dfl_gain: float = 1.5
    tal_topk: int = 10
    tal_alpha: float = 0.5
    tal_beta: float = 6.0


def _dfl_loss(pred_logits: jnp.ndarray, target: jnp.ndarray,
              reg_max: int) -> jnp.ndarray:
    """Distribution focal loss per distance: CE against the two adjacent
    integer bins, linearly weighted. pred_logits [..., 4, reg_max],
    target [..., 4] in [0, reg_max-1]. Returns [...] (mean over the 4
    distances)."""
    tl = jnp.floor(target).astype(jnp.int32)
    tr = jnp.minimum(tl + 1, reg_max - 1)
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    ce_l = -jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    ce_r = -jnp.take_along_axis(logp, tr[..., None], axis=-1)[..., 0]
    return (ce_l * wl + ce_r * wr).mean(-1)


@partial(jax.jit, static_argnames=("cfg",))
def obb_loss(
    raw: dict,                # model output dict (box/cls/ang per level)
    gt_labels: jnp.ndarray,   # [B, M] int
    gt_xywhr: jnp.ndarray,    # [B, M, 5] in input pixels
    gt_mask: jnp.ndarray,     # [B, M] bool
    cfg: LossConfig = LossConfig(),
):
    """Returns (total_loss, dict of components)."""
    box_logits = D.flatten_levels(raw["box"])          # [B, A, 4*reg_max]
    cls_logits = D.flatten_levels(raw["cls"])          # [B, A, nc]
    ang_raw = D.flatten_levels(raw["ang"])[..., 0]     # [B, A]

    B, A = ang_raw.shape
    anchor_pts, strides = D.make_anchors(cfg.img_size)  # grid units

    ltrb = D.dfl_expectation(box_logits, cfg.reg_max)   # grid units
    angle = D.decode_angle(ang_raw)
    pred_rbox_grid = D.dist2rbox(ltrb, angle, anchor_pts[None])  # [B,A,5]

    # assignment in pixel units
    pred_rbox_px = pred_rbox_grid.at[..., :4].multiply(
        strides[None, :, None])
    pred_rbox_px = jax.lax.stop_gradient(pred_rbox_px)
    scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))

    tgt = assigner.assign(
        jax.lax.stop_gradient(scores), pred_rbox_px,
        anchor_pts * strides[:, None], gt_labels, gt_xywhr, gt_mask,
        topk=cfg.tal_topk, alpha=cfg.tal_alpha, beta=cfg.tal_beta,
        nc=cfg.nc)

    fg = tgt["fg"]                                     # [B, A]
    t_scores = tgt["scores"]                           # [B, A, nc]
    score_sum = jnp.maximum(t_scores.sum(), 1.0)

    # --- cls BCE over all anchors ---
    bce = optax.sigmoid_binary_cross_entropy(
        cls_logits.astype(jnp.float32), t_scores)
    loss_cls = bce.sum() / score_sum

    # --- box ProbIoU on matched anchors (grid units) ---
    t_boxes_grid = tgt["bboxes"].at[..., :4].divide(
        strides[None, :, None])                        # [B, A, 5]
    # non-fg anchors may carry padded (all-zero) targets; substitute a
    # unit box at the anchor so probiou and its gradient stay finite
    # (the lanes are masked out of the loss anyway)
    dummy = jnp.concatenate(
        [jnp.broadcast_to(anchor_pts, (B, A, 2)),
         jnp.ones((B, A, 2), t_boxes_grid.dtype),
         jnp.zeros((B, A, 1), t_boxes_grid.dtype)], axis=-1)
    t_boxes_grid = jnp.where(fg[..., None], t_boxes_grid, dummy)
    weight = t_scores.sum(-1)                          # [B, A]
    # PREDICTED boxes at non-fg anchors need the same substitution: a
    # degenerate prediction (w or h ~ 0 from the DFL expectation) makes
    # probiou NaN there, and although the primal is masked out below,
    # `where` still backprops 0 * nan = NaN through the false branch —
    # which silently NaN'd params on batches whose assignment came up
    # empty. The engine never sees these lanes (it gathers fg pairs
    # only), so substituting is semantics-exact.
    pred_used = jnp.where(fg[..., None], pred_rbox_grid, dummy)
    iou = G.probiou(pred_used, t_boxes_grid)
    loss_box = jnp.where(fg, (1.0 - iou) * weight, 0.0).sum() / score_sum

    # --- DFL on axis-aligned ltrb of the target box (grid units) ---
    half = t_boxes_grid[..., 2:4] / 2.0
    xy1 = t_boxes_grid[..., :2] - half
    xy2 = t_boxes_grid[..., :2] + half
    t_lt = anchor_pts[None] - xy1
    t_rb = xy2 - anchor_pts[None]
    t_ltrb = jnp.clip(jnp.concatenate([t_lt, t_rb], -1),
                      0.0, cfg.reg_max - 1 - 0.01)
    dfl = _dfl_loss(
        box_logits.reshape(B, A, 4, cfg.reg_max).astype(jnp.float32),
        t_ltrb, cfg.reg_max)
    loss_dfl = jnp.where(fg, dfl * weight, 0.0).sum() / score_sum

    total = (cfg.box_gain * loss_box + cfg.cls_gain * loss_cls
             + cfg.dfl_gain * loss_dfl) * B
    return total, {"box": loss_box, "cls": loss_cls, "dfl": loss_dfl,
                   "fg_count": fg.sum()}
