"""Raw head outputs -> rotated boxes; fixed-shape in-graph postprocess.

Covers what the ultralytics engine does between the network forward and the
Results object the reference consumes (`Detect_OBB.py:228-231`): DFL
softmax-expectation over reg_max bins, angle sigmoid to [-pi/4, 3pi/4),
dist2rbox composition on the anchor grid, confidence filtering and rotated
ProbIoU NMS (engine defaults conf 0.25/0.001, iou 0.7, max_det 300) — all
with static shapes so the whole chain jits into the tile-batch forward.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops import geometry as G
from ..ops import nms as NMS

STRIDES = (8, 16, 32)


def make_anchors(img_size: int, strides: Sequence[int] = STRIDES,
                 offset: float = 0.5):
    """Anchor cell centers + per-anchor stride for a square input.

    Returns (points [A, 2] in feature-cell units, strides [A])."""
    pts, sts = [], []
    for s in strides:
        n = img_size // s
        xs = (jnp.arange(n) + offset)
        gy, gx = jnp.meshgrid(xs, xs, indexing="ij")
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        sts.append(jnp.full((n * n,), s, dtype=jnp.float32))
    return jnp.concatenate(pts), jnp.concatenate(sts)


def dfl_expectation(box_logits: jnp.ndarray, reg_max: int = 16
                    ) -> jnp.ndarray:
    """[..., 4*reg_max] -> [..., 4] distances via softmax expectation."""
    shape = box_logits.shape[:-1]
    x = box_logits.reshape(*shape, 4, reg_max)
    p = jax.nn.softmax(x.astype(jnp.float32), axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return (p * bins).sum(-1)


def decode_angle(ang_raw: jnp.ndarray) -> jnp.ndarray:
    """sigmoid -> [-pi/4, 3pi/4)."""
    return (jax.nn.sigmoid(ang_raw.astype(jnp.float32)) - 0.25) * jnp.pi


def dist2rbox(ltrb: jnp.ndarray, angle: jnp.ndarray, anchor_pts: jnp.ndarray
              ) -> jnp.ndarray:
    """Distances (l,t,r,b in cell units) + angle + anchor centers -> xywhr
    (cell units; multiply xy/wh by stride afterwards)."""
    lt, rb = ltrb[..., :2], ltrb[..., 2:]
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    xf = (rb[..., 0] - lt[..., 0]) / 2.0
    yf = (rb[..., 1] - lt[..., 1]) / 2.0
    x = xf * cos - yf * sin + anchor_pts[..., 0]
    y = xf * sin + yf * cos + anchor_pts[..., 1]
    w = lt[..., 0] + rb[..., 0]
    h = lt[..., 1] + rb[..., 1]
    return jnp.stack([x, y, w, h, angle], axis=-1)


def flatten_levels(outs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """[(B,Hi,Wi,C)...] -> [B, sum(Hi*Wi), C] in level order (P3,P4,P5)."""
    return jnp.concatenate(
        [o.reshape(o.shape[0], -1, o.shape[-1]) for o in outs], axis=1)


def decode_raw(out: dict, img_size: int, reg_max: int = 16):
    """Network output dict -> (xywhr [B,A,5] in input pixels,
    scores [B,A,nc] sigmoid)."""
    box = flatten_levels(out["box"])                  # [B, A, 4*reg_max]
    cls = flatten_levels(out["cls"])                  # [B, A, nc]
    ang = flatten_levels(out["ang"])[..., 0]          # [B, A]

    anchor_pts, strides = make_anchors(img_size)
    ltrb = dfl_expectation(box, reg_max)
    angle = decode_angle(ang)
    rbox = dist2rbox(ltrb, angle, anchor_pts[None])   # cell units
    rbox = rbox.at[..., :4].multiply(strides[None, :, None])
    scores = jax.nn.sigmoid(cls.astype(jnp.float32))
    return rbox, scores


@partial(jax.jit, static_argnames=("max_det", "pre_topk"))
def postprocess_batch(
    rbox: jnp.ndarray,      # [B, A, 5] xywhr, input pixels
    scores: jnp.ndarray,    # [B, A, nc]
    conf_thr: float | jnp.ndarray,
    iou_thr: float | jnp.ndarray = 0.7,
    max_det: int = 300,
    pre_topk: int = 512,
):
    """Fixed-shape engine NMS: single-label conf/cls, top-`pre_topk`
    candidates, class-aware greedy ProbIoU NMS, top-`max_det` kept.

    Returns dict of per-image padded arrays: xywhr [B,max_det,5],
    corners8 [B,max_det,8], cls [B,max_det], conf [B,max_det],
    valid [B,max_det]."""
    conf = scores.max(-1)                              # [B, A]
    cls = scores.argmax(-1).astype(jnp.int32)
    pre_topk = min(pre_topk, conf.shape[-1])
    max_det = min(max_det, pre_topk)

    def one(rb, cf, cl):
        cand_conf, idx = jax.lax.top_k(cf, pre_topk)
        cand_rb = rb[idx]
        cand_cl = cl[idx]
        valid = cand_conf >= conf_thr
        c8 = G.xywhr_to_corners8(cand_rb)
        # engine semantics: ultralytics nms_rotated is the ONE-SHOT rule
        # (suppressed boxes still suppress) — pure matrix ops, no
        # sequential loop
        keep = NMS.nms_keep_mask_oneshot(c8, cand_cl, cand_conf, valid,
                                         iou_thr)
        sel, sel_valid = NMS.compact_topk(cand_conf, keep, max_det)
        return (cand_rb[sel], c8[sel], cand_cl[sel], cand_conf[sel],
                sel_valid)

    rb, c8, cl, cf, va = jax.vmap(one)(rbox, conf, cls)
    return {"xywhr": rb, "corners8": c8, "cls": cl, "conf": cf, "valid": va}
