"""Oriented-bounding-box geometry kernels (pure JAX, vmap/jit friendly).

Replaces the reference's shapely/GEOS polygon ops (`Detect_OBB.py:135-174`:
``compute_polygon_iou``, ``box_center_from_xyxyxyxy``,
``compute_angle_from_bbox``) with vectorized, fixed-shape TPU-native
equivalents:

* **Exact quad-quad IoU** via triangle decomposition + Sutherland-Hodgman
  clipping. Each simple quad splits into two triangles along an internal
  diagonal; the intersection area of two simple quads is the sum of the four
  pairwise triangle-triangle intersection areas (triangles are convex, so
  Sutherland-Hodgman is exact). Self-intersecting ("invalid" in shapely
  terms) quads yield IoU 0.0, matching `Detect_OBB.py:150-153`.
* **ProbIoU** (Gaussian Bhattacharyya IoU) on (cx,cy,w,h,theta) boxes, used
  by the rotated NMS fast path and the training box loss.
* Representation converters corners8 <-> xywhr, centers, strike angle.

All functions are shape-polymorphic over leading batch dims via `vmap` and
contain no data-dependent control flow, so they fuse cleanly under `jit`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Max vertices of any intermediate polygon during triangle-triangle clipping:
# a triangle clipped by 3 half-planes grows by at most 1 vertex per clip.
_MAXV = 8


# ---------------------------------------------------------------------------
# Representation converters
# ---------------------------------------------------------------------------

def corners8_to_pts(c8: jnp.ndarray) -> jnp.ndarray:
    """[..., 8] -> [..., 4, 2] corner points."""
    return c8.reshape(*c8.shape[:-1], 4, 2)


def pts_to_corners8(pts: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 2] -> [..., 8]."""
    return pts.reshape(*pts.shape[:-2], 8)


def xywhr_to_corners8(xywhr: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h, theta) -> 8 corner coords [x1,y1,...,x4,y4].

    Corner order matches ultralytics' `xywhr2xyxyxyxy`: starting at
    (+w/2,+h/2) rotated, i.e. vectors (vec1=w/2 along theta, vec2=h/2 across),
    corners = [c+v1+v2, c+v1-v2, c-v1-v2, c-v1+v2].
    """
    cx, cy, w, h, r = jnp.split(xywhr, 5, axis=-1)
    cos, sin = jnp.cos(r), jnp.sin(r)
    v1x, v1y = w / 2 * cos, w / 2 * sin
    v2x, v2y = -h / 2 * sin, h / 2 * cos
    pts = jnp.concatenate(
        [
            cx + v1x + v2x, cy + v1y + v2y,
            cx + v1x - v2x, cy + v1y - v2y,
            cx - v1x - v2x, cy - v1y - v2y,
            cx - v1x + v2x, cy - v1y + v2y,
        ],
        axis=-1,
    )
    return pts


def corners8_to_xywhr(c8: jnp.ndarray) -> jnp.ndarray:
    """Best-effort inverse of `xywhr_to_corners8` (exact for rectangles).

    With the corner order produced above, p0->p3 spans 2*v1 (the 'w' edge)
    and p0->p1 spans 2*v2 (the 'h' edge); both adjacent edges are measured
    to recover (w, h, theta).
    """
    pts = corners8_to_pts(c8)
    c = pts.mean(axis=-2)
    e_w = pts[..., 0, :] - pts[..., 3, :]   # = 2*v1 (w-direction)
    e_h = pts[..., 0, :] - pts[..., 1, :]   # = 2*v2 (h-direction)
    w = jnp.linalg.norm(e_w, axis=-1)
    h = jnp.linalg.norm(e_h, axis=-1)
    theta = jnp.arctan2(e_w[..., 1], e_w[..., 0])
    return jnp.stack([c[..., 0], c[..., 1], w, h, theta], axis=-1)


def corners8_to_xywhr_np(c8):
    """Numpy twin of `corners8_to_xywhr` for host-side data paths (avoids
    per-sample device round-trips in the loader)."""
    import numpy as np

    pts = np.asarray(c8, np.float64).reshape(-1, 4, 2)
    c = pts.mean(axis=1)
    e_w = pts[:, 0] - pts[:, 3]
    e_h = pts[:, 0] - pts[:, 1]
    w = np.linalg.norm(e_w, axis=-1)
    h = np.linalg.norm(e_h, axis=-1)
    theta = np.arctan2(e_w[:, 1], e_w[:, 0])
    return np.stack([c[:, 0], c[:, 1], w, h, theta], axis=-1)


def box_center(c8: jnp.ndarray) -> jnp.ndarray:
    """4-corner centroid, matching `Detect_OBB.py:159-165`. [..., 8] -> [..., 2]."""
    pts = corners8_to_pts(c8)
    return pts.mean(axis=-2)


def strike_angle(c8: jnp.ndarray) -> jnp.ndarray:
    """Strike angle in degrees folded to [0, 180], matching
    `Detect_OBB.py:135-142`: atan2(x4-x1, y4-y1) * 180/pi, then
    angle>0 -> 180-angle else abs(angle)."""
    x1, y1 = c8[..., 0], c8[..., 1]
    x4, y4 = c8[..., 6], c8[..., 7]
    ang = jnp.arctan2(x4 - x1, y4 - y1) * (180.0 / jnp.pi)
    return jnp.where(ang > 0, 180.0 - ang, jnp.abs(ang))


# ---------------------------------------------------------------------------
# Exact polygon intersection (triangle-decomposed Sutherland-Hodgman)
# ---------------------------------------------------------------------------

def _cross2(o, a, b):
    """2D cross product of (a-o) x (b-o)."""
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def _poly_area_masked(pts: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area (absolute) of the first `n` vertices of pts [_MAXV, 2]."""
    idx = jnp.arange(_MAXV)
    nxt = jnp.where(idx + 1 >= n, 0, idx + 1)
    p = pts
    q = pts[nxt]
    terms = p[:, 0] * q[:, 1] - q[:, 0] * p[:, 1]
    terms = jnp.where(idx < n, terms, 0.0)
    return jnp.abs(terms.sum()) * 0.5


def _clip_halfplane(pts: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray):
    """Clip polygon pts [S, 2] (cyclic, duplicate vertices allowed) by the
    half-plane left-of a->b. Returns ([2S, 2] polygon, empty flag).

    Sort-free fixed-shape Sutherland-Hodgman: each directed edge emits two
    candidate slots (crossing point, then endpoint-if-inside); absent slots
    are forward-filled with the previous emitted vertex (cummax gather),
    and leading absent slots wrap to the LAST emitted vertex — duplicates
    are adjacent repeats in cyclic order, contributing zero shoelace area.
    This avoids the per-pair argsort compaction that dominated the NMS
    kernel's runtime on TPU.
    """
    s = pts
    e = jnp.roll(pts, -1, axis=0)

    ab = b - a
    d_s = ab[0] * (s[:, 1] - a[1]) - ab[1] * (s[:, 0] - a[0])
    d_e = ab[0] * (e[:, 1] - a[1]) - ab[1] * (e[:, 0] - a[0])
    in_s = d_s >= 0.0
    in_e = d_e >= 0.0

    denom = d_s - d_e
    safe = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    t = jnp.clip(d_s / safe, 0.0, 1.0)
    inter = s + t[:, None] * (e - s)

    cand = jnp.stack([inter, e], axis=1).reshape(-1, 2)   # [2S, 2]
    mask = jnp.stack([in_s != in_e, in_e], axis=1).reshape(-1)

    n2 = cand.shape[0]
    idx = jnp.arange(n2)
    idx_valid = jnp.where(mask, idx, -1)
    fill = jax.lax.associative_scan(jnp.maximum, idx_valid)   # cummax
    last = idx_valid.max()
    sel = jnp.where(fill >= 0, fill, jnp.maximum(last, 0))
    out = cand[sel]
    return out, ~mask.any()


def _poly_area_cyclic(pts: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area of a cyclic vertex list (duplicates allowed)."""
    nxt = jnp.roll(pts, -1, axis=0)
    return jnp.abs(
        (pts[:, 0] * nxt[:, 1] - nxt[:, 0] * pts[:, 1]).sum()) * 0.5


def _tri_tri_inter_area(t1: jnp.ndarray, t2: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two triangles [3,2] (any orientation)."""

    def ccw(t):
        s = _cross2(t[0], t[1], t[2])
        return jnp.where(s < 0, t[::-1], t)

    t1 = ccw(t1)
    t2 = ccw(t2)
    pts = t1
    empty = jnp.asarray(False)
    for k in range(3):
        pts, emp = _clip_halfplane(pts, t2[k], t2[(k + 1) % 3])
        empty = empty | emp
    return jnp.where(empty, 0.0, _poly_area_cyclic(pts))


def _quad_triangles(pts: jnp.ndarray) -> jnp.ndarray:
    """Split a simple quad [4,2] into two non-overlapping triangles [2,3,2].

    For a simple quad exactly one diagonal is internal; it is the one for
    which the two shoelace sub-triangles carry the same sign.
    """
    a1 = _cross2(pts[0], pts[1], pts[2])  # 2*signed area tri(0,1,2)
    a2 = _cross2(pts[0], pts[2], pts[3])  # 2*signed area tri(0,2,3)
    use02 = a1 * a2 >= 0

    tris02 = jnp.stack([pts[jnp.array([0, 1, 2])], pts[jnp.array([0, 2, 3])]])
    tris13 = jnp.stack([pts[jnp.array([1, 2, 3])], pts[jnp.array([1, 3, 0])]])
    return jnp.where(use02, tris02, tris13)


def _segments_properly_intersect(p1, p2, p3, p4) -> jnp.ndarray:
    """True iff open segments p1p2 and p3p4 properly cross."""
    d1 = _cross2(p3, p4, p1)
    d2 = _cross2(p3, p4, p2)
    d3 = _cross2(p1, p2, p3)
    d4 = _cross2(p1, p2, p4)
    return (d1 * d2 < 0) & (d3 * d4 < 0)


def quad_is_simple(c8: jnp.ndarray) -> jnp.ndarray:
    """True iff the quad is non-self-intersecting (shapely `is_valid` proxy
    for 4-gons; `Detect_OBB.py:150-151` treats invalid polygons as IoU 0)."""
    pts = corners8_to_pts(c8)
    x01_23 = _segments_properly_intersect(pts[..., 0, :], pts[..., 1, :],
                                          pts[..., 2, :], pts[..., 3, :])
    x12_30 = _segments_properly_intersect(pts[..., 1, :], pts[..., 2, :],
                                          pts[..., 3, :], pts[..., 0, :])
    return ~(x01_23 | x12_30)


def quad_area(c8: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area of a quad given as [..., 8]."""
    pts = corners8_to_pts(c8)
    x, y = pts[..., 0], pts[..., 1]
    xn, yn = jnp.roll(x, -1, axis=-1), jnp.roll(y, -1, axis=-1)
    return jnp.abs(jnp.sum(x * yn - xn * y, axis=-1)) * 0.5


def _quad_inter_area_single(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Exact intersection area of two simple quads given as [8] each."""
    t1 = _quad_triangles(corners8_to_pts(q1))
    t2 = _quad_triangles(corners8_to_pts(q2))
    area = 0.0
    for i in range(2):
        for j in range(2):
            area = area + _tri_tri_inter_area(t1[i], t2[j])
    return area


@jax.jit
def quad_iou_single(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Exact IoU of two quads [8]; 0.0 if either is self-intersecting or the
    union is empty — bit-matching `compute_polygon_iou`
    (`Detect_OBB.py:144-154`)."""
    inter = _quad_inter_area_single(q1, q2)
    a1 = quad_area(q1)
    a2 = quad_area(q2)
    union = a1 + a2 - inter
    valid = quad_is_simple(q1) & quad_is_simple(q2) & (union > 0)
    return jnp.where(valid, inter / jnp.where(union > 0, union, 1.0), 0.0)


@jax.jit
def quad_iou_matrix(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise exact IoU matrix: q1 [N, 8], q2 [M, 8] -> [N, M].

    Row-chunked (lax.map over blocks of 128 rows) so the clipping
    intermediates ([chunk, M, 16, 2] etc.) stay bounded for large N
    instead of materializing O(N*M) buffers at once."""
    n = q1.shape[0]
    chunk = 128
    row = jax.vmap(lambda a: jax.vmap(
        lambda b: quad_iou_single(a, b))(q2))
    if n <= chunk:
        return row(q1)
    pad = (-n) % chunk
    q1p = jnp.pad(q1, ((0, pad), (0, 0)))
    blocks = q1p.reshape(-1, chunk, q1.shape[-1])
    out = jax.lax.map(row, blocks)
    return out.reshape(-1, q2.shape[0])[:n]


quad_iou_pairs = jax.jit(jax.vmap(quad_iou_single))  # [N,8],[N,8] -> [N]


# ---------------------------------------------------------------------------
# ProbIoU (Gaussian IoU for rotated boxes)
# ---------------------------------------------------------------------------

def _xywhr_to_gaussian(xywhr: jnp.ndarray):
    """Rotated box -> 2D Gaussian (mean, covariance terms a, b, c)."""
    w, h, r = xywhr[..., 2], xywhr[..., 3], xywhr[..., 4]
    cos, sin = jnp.cos(r), jnp.sin(r)
    w2, h2 = (w * w) / 12.0, (h * h) / 12.0
    a = w2 * cos * cos + h2 * sin * sin
    b = w2 * sin * sin + h2 * cos * cos
    c = (w2 - h2) * cos * sin
    return a, b, c


def probiou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7,
            ) -> jnp.ndarray:
    """ProbIoU between broadcastable xywhr boxes [..., 5].

    iou = 1 - Hellinger distance, via the Bhattacharyya distance of the two
    box Gaussians. Replaces ultralytics' torch `probiou` used by the rotated
    NMS and the OBB box loss.
    """
    x1, y1 = box1[..., 0], box1[..., 1]
    x2, y2 = box2[..., 0], box2[..., 1]
    a1, b1, c1 = _xywhr_to_gaussian(box1)
    a2, b2, c2 = _xywhr_to_gaussian(box2)

    dx, dy = x2 - x1, y2 - y1
    sa, sb, sc = a1 + a2, b1 + b2, c1 + c2
    denom = sa * sb - sc * sc
    denom = jnp.maximum(denom, eps)

    t1 = ((sa * dy * dy + sb * dx * dx) / denom) * 0.25
    t2 = ((sc * dx * dy * -2.0) / denom) * 0.25  # cross term
    det1 = jnp.maximum(a1 * b1 - c1 * c1, 0.0)
    det2 = jnp.maximum(a2 * b2 - c2 * c2, 0.0)
    # where-guarded sqrt: d sqrt/dx at 0 is inf, and degenerate (padded)
    # boxes reach here under masked-out lanes — 0 cotangent * inf = NaN
    prod = det1 * det2
    safe = jnp.where(prod > 0, prod, 1.0)
    root = jnp.where(prod > 0, jnp.sqrt(safe), 0.0)
    t3 = 0.5 * jnp.log(denom / (4.0 * root + eps) + eps)

    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    return 1.0 - hd


def probiou_matrix(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise ProbIoU: b1 [N,5], b2 [M,5] -> [N,M]."""
    return probiou(b1[:, None, :], b2[None, :, :])


# ---------------------------------------------------------------------------
# Point-in-quad (replaces shapely `Polygon.contains(Point)` in center-hit)
# ---------------------------------------------------------------------------

def point_in_quad(pt: jnp.ndarray, c8: jnp.ndarray) -> jnp.ndarray:
    """True iff point [..., 2] lies strictly inside the simple quad [..., 8].

    Winding/ray-crossing test, vectorized; matches shapely `contains`
    (boundary points excluded) for the simple quads used in
    `Detect_OBB.py:609-648` center-hit metric.
    """
    pts = corners8_to_pts(c8)
    x, y = pt[..., 0], pt[..., 1]
    inside = jnp.zeros(jnp.broadcast_shapes(x.shape, pts.shape[:-2]),
                       dtype=bool)
    on_edge = jnp.zeros_like(inside)
    for i in range(4):
        x1, y1 = pts[..., i, 0], pts[..., i, 1]
        x2, y2 = pts[..., (i + 1) % 4, 0], pts[..., (i + 1) % 4, 1]
        cond = (y1 > y) != (y2 > y)
        xint = (x2 - x1) * (y - y1) / jnp.where(y2 == y1, 1.0, y2 - y1) + x1
        inside = jnp.where(cond & (x < xint), ~inside, inside)
        # boundary check: point collinear with the edge and within its bbox
        cr = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
        within = (jnp.minimum(x1, x2) <= x) & (x <= jnp.maximum(x1, x2)) & (
            jnp.minimum(y1, y2) <= y) & (y <= jnp.maximum(y1, y2))
        on_edge = on_edge | ((cr == 0) & within)
    return inside & ~on_edge


def point_in_quad_np(pt, c8):
    """Numpy twin of `point_in_quad` for host-side eval paths: eager jnp
    calls with per-image shapes trigger a fresh per-op compile each
    (measured 18 s over a 100-image center-hit sweep, 232 s when they
    additionally dispatch through the TPU tunnel). Same algorithm,
    tested equal (`test_geometry.py`)."""
    import numpy as np

    pt = np.asarray(pt, np.float64)
    pts = np.asarray(c8, np.float64).reshape(*np.shape(c8)[:-1], 4, 2)
    x, y = pt[..., 0], pt[..., 1]
    inside = np.zeros(np.broadcast_shapes(x.shape, pts.shape[:-2]), bool)
    on_edge = np.zeros_like(inside)
    for i in range(4):
        x1, y1 = pts[..., i, 0], pts[..., i, 1]
        x2, y2 = pts[..., (i + 1) % 4, 0], pts[..., (i + 1) % 4, 1]
        cond = (y1 > y) != (y2 > y)
        xint = (x2 - x1) * (y - y1) / np.where(y2 == y1, 1.0, y2 - y1) + x1
        inside = np.where(cond & (x < xint), ~inside, inside)
        cr = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
        within = (np.minimum(x1, x2) <= x) & (x <= np.maximum(x1, x2)) & (
            np.minimum(y1, y2) <= y) & (y <= np.maximum(y1, y2))
        on_edge = on_edge | ((cr == 0) & within)
    return inside & ~on_edge


def quad_is_simple_np(c8):
    """Numpy twin of `quad_is_simple` (see `point_in_quad_np`)."""
    import numpy as np

    pts = np.asarray(c8, np.float64).reshape(*np.shape(c8)[:-1], 4, 2)

    def cross(o, a, b):
        return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
            a[..., 1] - o[..., 1]) * (b[..., 0] - o[..., 0])

    def proper(p1, p2, p3, p4):
        d1, d2 = cross(p3, p4, p1), cross(p3, p4, p2)
        d3, d4 = cross(p1, p2, p3), cross(p1, p2, p4)
        return (d1 * d2 < 0) & (d3 * d4 < 0)

    x01_23 = proper(pts[..., 0, :], pts[..., 1, :],
                    pts[..., 2, :], pts[..., 3, :])
    x12_30 = proper(pts[..., 1, :], pts[..., 2, :],
                    pts[..., 3, :], pts[..., 0, :])
    return ~(x01_23 | x12_30)
