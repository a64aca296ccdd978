"""Geometry kernel tests vs. host oracles.

The reference uses shapely/GEOS (`Detect_OBB.py:144-154`); shapely is not in
this image, so the oracles are cv2.intersectConvexConvex (exact for convex
polygons) and high-resolution rasterization (for non-convex/degenerate
cases)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oriented_object_detection_tpu.ops import geometry as G

cv2 = pytest.importorskip("cv2")


def random_rect(rng, lo=0.0, hi=100.0, wmax=40.0):
    cx, cy = rng.uniform(lo + 10, hi - 10, 2)
    w, h = rng.uniform(2.0, wmax, 2)
    th = rng.uniform(-np.pi, np.pi)
    return np.array([cx, cy, w, h, th])


def oracle_iou_convex(c8a, c8b):
    pa = np.asarray(c8a, np.float64).reshape(4, 2).astype(np.float32)
    pb = np.asarray(c8b, np.float64).reshape(4, 2).astype(np.float32)
    inter, _ = cv2.intersectConvexConvex(pa, pb)
    area = lambda p: abs(cv2.contourArea(p.astype(np.float32)))
    u = area(pa) + area(pb) - inter
    return inter / u if u > 0 else 0.0


def oracle_iou_raster(c8a, c8b, scale=8):
    """Pixel-count IoU on an upscaled raster (approximate, any simple poly)."""
    pts = np.concatenate([np.reshape(c8a, (4, 2)), np.reshape(c8b, (4, 2))])
    mn = pts.min(0) - 2
    size = (pts.max(0) - mn + 4) * scale
    W, H = int(size[0]) + 1, int(size[1]) + 1
    m1 = np.zeros((H, W), np.uint8)
    m2 = np.zeros((H, W), np.uint8)
    q1 = ((np.reshape(c8a, (4, 2)) - mn) * scale).astype(np.int32)
    q2 = ((np.reshape(c8b, (4, 2)) - mn) * scale).astype(np.int32)
    cv2.fillPoly(m1, [q1], 1)
    cv2.fillPoly(m2, [q2], 1)
    inter = np.logical_and(m1, m2).sum()
    union = np.logical_or(m1, m2).sum()
    return inter / union if union > 0 else 0.0


class TestConverters:
    def test_xywhr_corner_roundtrip(self):
        rng = np.random.RandomState(0)
        boxes = np.stack([random_rect(rng) for _ in range(64)])
        c8 = G.xywhr_to_corners8(jnp.asarray(boxes))
        back = G.corners8_to_xywhr(c8)
        np.testing.assert_allclose(np.asarray(back[:, :2]), boxes[:, :2],
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(back[:, 2:4]), boxes[:, 2:4],
                                   atol=1e-6)
        # theta is recovered modulo pi direction conventions: check corners
        c8b = G.xywhr_to_corners8(back)
        np.testing.assert_allclose(np.asarray(c8b), np.asarray(c8), atol=1e-5)

    def test_box_center(self):
        c8 = jnp.array([0.0, 0, 2, 0, 2, 2, 0, 2])
        np.testing.assert_allclose(np.asarray(G.box_center(c8)), [1.0, 1.0])

    def test_strike_angle_matches_reference_formula(self):
        rng = np.random.RandomState(1)
        for _ in range(50):
            c8 = rng.uniform(0, 100, 8)
            x1, y1, x4, y4 = c8[0], c8[1], c8[6], c8[7]
            ang = np.arctan2(x4 - x1, y4 - y1) * 180.0 / np.pi
            ref = 180 - ang if ang > 0 else abs(ang)
            got = float(G.strike_angle(jnp.asarray(c8)))
            assert abs(got - ref) < 1e-4


class TestExactIoU:
    def test_identical(self):
        c8 = G.xywhr_to_corners8(jnp.array([10.0, 10, 4, 2, 0.3]))
        assert abs(float(G.quad_iou_single(c8, c8)) - 1.0) < 1e-6

    def test_disjoint(self):
        a = G.xywhr_to_corners8(jnp.array([10.0, 10, 4, 2, 0.3]))
        b = G.xywhr_to_corners8(jnp.array([50.0, 50, 4, 2, 0.3]))
        assert float(G.quad_iou_single(a, b)) == 0.0

    def test_vs_cv2_oracle_random_rects(self):
        rng = np.random.RandomState(42)
        boxes1 = np.stack([random_rect(rng) for _ in range(200)])
        boxes2 = np.stack([random_rect(rng) for _ in range(200)])
        c1 = np.asarray(G.xywhr_to_corners8(jnp.asarray(boxes1)))
        c2 = np.asarray(G.xywhr_to_corners8(jnp.asarray(boxes2)))
        got = np.asarray(G.quad_iou_pairs(jnp.asarray(c1), jnp.asarray(c2)))
        for i in range(len(c1)):
            ref = oracle_iou_convex(c1[i], c2[i])
            assert abs(got[i] - ref) < 5e-5, (i, got[i], ref)

    def test_vs_cv2_oracle_high_overlap(self):
        """Jittered near-duplicates — the NMS-threshold-sensitive regime."""
        rng = np.random.RandomState(7)
        for _ in range(100):
            b1 = random_rect(rng)
            b2 = b1 + rng.normal(0, 1.0, 5) * np.array([1, 1, 1, 1, 0.05])
            c1 = np.asarray(G.xywhr_to_corners8(jnp.asarray(b1)))
            c2 = np.asarray(G.xywhr_to_corners8(jnp.asarray(b2)))
            got = float(G.quad_iou_single(jnp.asarray(c1), jnp.asarray(c2)))
            ref = oracle_iou_convex(c1, c2)
            assert abs(got - ref) < 5e-5

    def test_nonconvex_simple_quad(self):
        """A dart (non-convex but simple) quad vs rasterized oracle."""
        dart = np.array([0.0, 0, 10, 0, 5, 2.5, 5, 10], np.float64)
        rect = np.array([2.0, 0, 8, 0, 8, 8, 2, 8], np.float64)
        got = float(G.quad_iou_single(jnp.asarray(dart), jnp.asarray(rect)))
        ref = oracle_iou_raster(dart, rect, scale=64)
        assert abs(got - ref) < 2e-2

    def test_self_intersecting_returns_zero(self):
        bowtie = jnp.array([0.0, 0, 10, 10, 10, 0, 0, 10])
        rect = jnp.array([0.0, 0, 10, 0, 10, 10, 0, 10])
        assert float(G.quad_iou_single(bowtie, rect)) == 0.0
        assert not bool(G.quad_is_simple(bowtie))
        assert bool(G.quad_is_simple(rect))

    def test_containment(self):
        outer = G.xywhr_to_corners8(jnp.array([0.0, 0, 20, 20, 0.1]))
        inner = G.xywhr_to_corners8(jnp.array([0.0, 0, 5, 5, 0.9]))
        got = float(G.quad_iou_single(outer, inner))
        assert abs(got - 25.0 / 400.0) < 1e-6

    def test_iou_matrix_shape_and_symmetry(self):
        rng = np.random.RandomState(3)
        b = np.stack([random_rect(rng) for _ in range(16)])
        c = G.xywhr_to_corners8(jnp.asarray(b))
        m = G.quad_iou_matrix(c, c)
        assert m.shape == (16, 16)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m).T, atol=1e-6)
        np.testing.assert_allclose(np.diag(np.asarray(m)), 1.0, atol=1e-6)


class TestProbIoU:
    def test_self_is_one(self):
        b = jnp.array([10.0, 10, 4, 2, 0.3])
        assert float(G.probiou(b, b)) > 0.99

    def test_monotone_in_distance(self):
        b = jnp.array([0.0, 0, 4, 4, 0.0])
        prev = 1.0
        for d in [0.0, 1.0, 2.0, 4.0, 8.0]:
            v = float(G.probiou(b, jnp.array([d, 0, 4, 4, 0.0])))
            assert v <= prev + 1e-6
            prev = v

    def test_matrix(self):
        rng = np.random.RandomState(5)
        b = jnp.asarray(np.stack([random_rect(rng) for _ in range(8)]))
        m = G.probiou_matrix(b, b)
        assert m.shape == (8, 8)
        np.testing.assert_allclose(np.diag(np.asarray(m)), 1.0, atol=1e-2)


class TestPointInQuad:
    def test_inside_outside(self):
        rect = jnp.array([0.0, 0, 10, 0, 10, 10, 0, 10])
        assert bool(G.point_in_quad(jnp.array([5.0, 5.0]), rect))
        assert not bool(G.point_in_quad(jnp.array([15.0, 5.0]), rect))
        # boundary excluded (shapely contains semantics)
        assert not bool(G.point_in_quad(jnp.array([0.0, 5.0]), rect))

    def test_rotated_vs_oracle(self):
        rng = np.random.RandomState(9)
        for _ in range(50):
            b = random_rect(rng)
            c8 = np.asarray(G.xywhr_to_corners8(jnp.asarray(b)))
            pt = rng.uniform(0, 100, 2)
            got = bool(G.point_in_quad(jnp.asarray(pt), jnp.asarray(c8)))
            r = cv2.pointPolygonTest(
                c8.reshape(4, 2).astype(np.float32), tuple(pt), False)
            assert got == (r > 0)


class TestNumpyTwins:
    """Host numpy twins used by the eval hot path must equal the jnp
    versions bit-for-bit (eager jnp with per-image shapes recompiles per
    op; see evaluate_center_hit)."""

    def test_point_in_quad_np_matches_jnp(self):
        import jax.numpy as jnp

        rng = np.random.RandomState(0)
        quads = rng.rand(40, 8) * 100
        pts = rng.rand(25, 2) * 100
        # include exact corners and edge midpoints (boundary cases)
        pts = np.concatenate([pts, quads[:3, :2],
                              (quads[:3, :2] + quads[:3, 2:4]) / 2])
        a = np.asarray(G.point_in_quad(
            jnp.asarray(pts)[:, None, :], jnp.asarray(quads[None])))
        b = G.point_in_quad_np(pts[:, None, :], quads[None])
        np.testing.assert_array_equal(a, b)

    def test_quad_is_simple_np_matches_jnp(self):
        import jax.numpy as jnp

        rng = np.random.RandomState(1)
        quads = rng.rand(64, 8) * 50  # random octuples: many are bowties
        a = np.asarray(G.quad_is_simple(jnp.asarray(quads)))
        b = G.quad_is_simple_np(quads)
        np.testing.assert_array_equal(a, b)
        assert a.any() and (~a).any()  # both outcomes exercised
