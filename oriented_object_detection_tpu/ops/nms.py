"""Fixed-shape class-aware greedy rotated NMS (JAX, jit/vmap friendly).

TPU-native replacement for two reference components:

* the in-engine rotated ProbIoU NMS that ultralytics runs inside each
  per-crop predict call (`Detect_OBB.py:81-83`, engine defaults
  iou=0.7 / max_det=300), and
* `merge_detections` (`Detect_OBB.py:176-200`): confidence-descending greedy
  suppression where a detection is dropped iff an already-kept SAME-CLASS
  detection overlaps it with exact polygon IoU >= threshold.

Everything is padded to static shapes: inputs carry a validity mask, the
output is a keep mask over the original positions. The greedy scan is a
`lax.fori_loop` over the confidence-sorted order so the sequential semantics
(and therefore the exact detection sets) of the reference are preserved.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import geometry as G


@partial(jax.jit, static_argnames=())
def nms_keep_mask_oneshot(
    corners8: jnp.ndarray,   # [N, 8]
    cls_id: jnp.ndarray,     # [N]
    conf: jnp.ndarray,       # [N]
    valid: jnp.ndarray,      # [N]
    iou_thr: float | jnp.ndarray,
) -> jnp.ndarray:
    """One-shot rotated NMS — the ultralytics `nms_rotated` rule the
    reference's in-engine NMS actually applies: keep detection i iff no
    HIGHER-SCORED same-class detection overlaps it with ProbIoU >= thr
    (suppressed boxes still suppress; no sequential dependency, pure
    matrix ops). Class-awareness mirrors the engine's coordinate-offset
    trick. Returns keep mask in original order."""
    xywhr = G.corners8_to_xywhr(corners8)
    iou = G.probiou_matrix(xywhr, xywhr)
    same = cls_id[:, None] == cls_id[None, :]
    # strict priority: higher conf first; ties broken by original index
    # (matching argsort-stable ordering)
    idx = jnp.arange(conf.shape[0])
    key = jnp.where(valid, conf, -jnp.inf)
    higher = (key[:, None] > key[None, :]) | (
        (key[:, None] == key[None, :]) & (idx[:, None] < idx[None, :]))
    sup = (iou >= iou_thr) & same & higher & valid[:, None]
    return valid & ~sup.any(axis=0)


@partial(jax.jit, static_argnames=("use_exact",))
def nms_keep_mask(
    corners8: jnp.ndarray,   # [N, 8] corner coords (any units)
    cls_id: jnp.ndarray,     # [N] int class ids
    conf: jnp.ndarray,       # [N] confidences
    valid: jnp.ndarray,      # [N] bool validity mask (padding = False)
    iou_thr: float | jnp.ndarray,
    use_exact: bool = True,
) -> jnp.ndarray:
    """Greedy class-aware NMS; returns a bool keep mask in ORIGINAL order.

    `use_exact=True` uses the exact quad-quad IoU (the reference's merge
    rule, `Detect_OBB.py:193`); `False` uses ProbIoU on the xywhr fit
    (the in-engine NMS metric).

    NOTE (production status): this sequential device kernel is a TESTED
    ALTERNATIVE, not the production path. The pipeline's in-engine NMS
    uses the one-shot kernel above (`nms_keep_mask_oneshot`), and the
    per-tile merge (`Detect_OBB.py:264`) runs on the HOST over the few
    surviving rows (`infer/fusion.py::merge_detections` + native C++) —
    keeping the greedy scan in-graph as a padded O(max_det^2) loop
    dominated device time. Kept because it is the only in-graph option
    when host round trips are unacceptable (e.g. inside a larger fused
    program), mirror-tested against the reference semantics.
    """
    n = corners8.shape[0]
    # Sort by confidence descending, invalid entries last. Stable so that
    # equal-confidence detections keep their input order, matching
    # Python's list.sort in the reference.
    key = jnp.where(valid, conf, -jnp.inf)
    order = jnp.argsort(-key, stable=True)
    c8_s = corners8[order]
    cls_s = cls_id[order]
    valid_s = valid[order]

    if use_exact:
        iou = G.quad_iou_matrix(c8_s, c8_s)
    else:
        xywhr = G.corners8_to_xywhr(c8_s)
        iou = G.probiou_matrix(xywhr, xywhr)

    same_cls = cls_s[:, None] == cls_s[None, :]
    suppress = (iou >= iou_thr) & same_cls  # [i, j]: i suppresses j

    idx = jnp.arange(n)

    def body(i, keep):
        earlier = idx < i
        sup = jnp.any(keep & earlier & suppress[:, i])
        return keep.at[i].set(valid_s[i] & ~sup)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.zeros(n, dtype=bool))

    # Scatter back to original positions.
    keep = jnp.zeros(n, dtype=bool).at[order].set(keep_sorted)
    return keep


def nms_keep_mask_batched(corners8, cls_id, conf, valid, iou_thr,
                          use_exact: bool = True):
    """vmap over a leading tile/batch dim: [T,N,8],[T,N],[T,N],[T,N] -> [T,N]."""
    return jax.vmap(
        lambda c, k, s, v: nms_keep_mask(c, k, s, v, iou_thr,
                                         use_exact=use_exact)
    )(corners8, cls_id, conf, valid)


@partial(jax.jit, static_argnames=("max_out",))
def compact_topk(conf: jnp.ndarray, keep: jnp.ndarray, max_out: int):
    """Indices of the top-`max_out` kept detections by confidence
    (conf-descending, stable) plus a validity mask — fixed-shape compaction
    of an NMS result.

    Returns (indices [max_out], valid [max_out]).
    """
    key = jnp.where(keep, conf, -jnp.inf)
    order = jnp.argsort(-key, stable=True)[:max_out]
    return order, keep[order]
