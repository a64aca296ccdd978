"""Tiling engine tests: grid semantics vs reference loops, device gather vs
numpy slicing, stitching/border-filter behavior, label assignment."""

import numpy as np

import jax.numpy as jnp

from oriented_object_detection_tpu.ops import tiling as T


def ref_inference_grid(h, w, ts, ov):
    """Mirror of Detect_OBB.py:216-221 loop semantics."""
    step = max(1, ts - ov)
    out = []
    for y in range(0, h, step):
        for x in range(0, w, step):
            y2, x2 = min(y + ts, h), min(x + ts, w)
            if y2 - y == 0 or x2 - x == 0:
                continue
            out.append((x, y, x2 - x, y2 - y))
    return np.array(out)


class TestGrids:
    def test_inference_counts_match_survey(self):
        # Test1.png is 895x807 (WxH); Test2.png is 1056x1028
        assert len(T.inference_tile_grid(807, 895, 128, 30)) == 90
        assert len(T.inference_tile_grid(807, 895, 416, 100)) == 9
        assert len(T.inference_tile_grid(1028, 1056, 128, 30)) == 121
        assert len(T.inference_tile_grid(1028, 1056, 416, 100)) == 16

    def test_inference_grid_matches_reference_loop(self):
        for (h, w, ts, ov) in [(807, 895, 128, 30), (1028, 1056, 416, 100),
                               (100, 100, 128, 30), (417, 500, 416, 100)]:
            got = T.inference_tile_grid(h, w, ts, ov)
            ref = ref_inference_grid(h, w, ts, ov)
            np.testing.assert_array_equal(got, ref)

    def test_train_grid_full_tiles_only(self):
        g = T.train_tile_grid(807, 895, 416, 100)
        assert (g[:, 0] + 416 <= 895).all()
        assert (g[:, 1] + 416 <= 807).all()
        # mirror Train_OBB.py:88-91
        stride = 316
        ref = [(x, y) for y in range(0, 807, stride)
               for x in range(0, 895, stride)
               if y + 416 <= 807 and x + 416 <= 895]
        np.testing.assert_array_equal(g, np.array(ref))


class TestExtract:
    def test_interior_and_edge_tiles(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (100, 120, 3)).astype(np.uint8)
        grid = T.inference_tile_grid(100, 120, 64, 16)
        tiles = np.asarray(T.extract_tiles(
            jnp.asarray(img), jnp.asarray(grid[:, :2]), 64))
        assert tiles.shape == (len(grid), 64, 64, 3)
        for i, (x, y, cw, ch) in enumerate(grid):
            np.testing.assert_array_equal(
                tiles[i, :ch, :cw], img[y:y + ch, x:x + cw])
            # out-of-image area letterbox-padded
            if ch < 64:
                assert (tiles[i, ch:, :] == T.PAD_VALUE).all()
            if cw < 64:
                assert (tiles[i, :, cw:] == T.PAD_VALUE).all()


class TestStitchAndBorder:
    def test_stitch(self):
        c8 = jnp.ones((2, 3, 8))
        starts = jnp.array([[10, 20], [30, 40]])
        out = np.asarray(T.stitch_to_global(c8, starts))
        np.testing.assert_array_equal(out[0, 0], [11, 21] * 4)
        np.testing.assert_array_equal(out[1, 0], [31, 41] * 4)

    def test_border_filter_matches_reference(self):
        # Detect_OBB.py:167-174: margin <= c_rel <= crop - margin (inclusive)
        tiles = jnp.array([[100, 200, 128, 128]])
        m = 10
        pts = {
            (100 + 10, 200 + 10): True,     # exactly on margin -> kept
            (100 + 9.99, 200 + 50): False,
            (100 + 118, 200 + 118): True,   # crop-margin -> kept
            (100 + 118.01, 200 + 50): False,
            (100 + 64, 200 + 64): True,
        }
        for (cx, cy), expect in pts.items():
            got = bool(np.asarray(T.border_keep_mask(
                jnp.array([[[cx, cy]]]), tiles, m))[0, 0])
            assert got == expect, (cx, cy)

    def test_margin_for(self):
        assert T.margin_for(128) == 10
        assert T.margin_for(96) == 10
        assert T.margin_for(416) == 20


class TestLabelAssignment:
    def test_midpoint_ownership_and_coverage(self):
        ts = 100
        grid = np.array([[0, 0], [100, 0]])
        # box A: centered (midpoint of p1,p4) at (50,50), fully in tile 0
        a = [0, 40, 40, 60, 40, 60, 60, 40, 60]
        # box B: midpoint (x1+x4)/2 = 99 -> tile 0 owns it, but its AABB
        # coverage in tile 0 is only 2*20/(42*20) = 0.048 < 0.1 -> dropped
        # everywhere (tile 1 never owns it under the midpoint rule), exactly
        # like the reference (`Train_OBB.py:93-100`).
        b = [1, 98, 40, 140, 40, 140, 60, 100, 60]
        labels = np.array([a, b], dtype=np.float64)
        out = T.assign_labels_to_tiles(labels, grid, ts, 0.1)
        assert len(out) == 2
        assert len(out[0]) == 1 and out[0][0, 0] == 0
        assert len(out[1]) == 0
        # normalized and clipped
        assert (out[0][:, 1:] >= 0).all() and (out[0][:, 1:] <= 1).all()
        np.testing.assert_allclose(out[0][0, 1:], np.array(
            [40, 40, 60, 40, 60, 60, 40, 60]) / 100.0)

    def test_matches_reference_enumeration(self):
        """Randomized check vs a literal mirror of Train_OBB.py:93-108."""
        rng = np.random.RandomState(11)
        ts, H, W, ov = 100, 300, 400, 20
        grid = T.train_tile_grid(H, W, ts, ov)
        n = 40
        labels = np.zeros((n, 9))
        labels[:, 0] = rng.randint(0, 5, n)
        cx, cy = rng.uniform(0, W, n), rng.uniform(0, H, n)
        w_, h_ = rng.uniform(5, 60, n), rng.uniform(5, 60, n)
        labels[:, 1], labels[:, 2] = cx - w_ / 2, cy - h_ / 2
        labels[:, 3], labels[:, 4] = cx + w_ / 2, cy - h_ / 2
        labels[:, 5], labels[:, 6] = cx + w_ / 2, cy + h_ / 2
        labels[:, 7], labels[:, 8] = cx - w_ / 2, cy + h_ / 2

        got = T.assign_labels_to_tiles(labels, grid, ts, 0.1)

        for t, (x, y) in enumerate(grid):
            ref_rows = []
            for r in labels:
                mx, my = (r[1] + r[7]) / 2, (r[2] + r[8]) / 2
                if not (x <= mx < x + ts and y <= my < y + ts):
                    continue
                xs, ys = r[1::2], r[2::2]
                bx1, by1, bx2, by2 = xs.min(), ys.min(), xs.max(), ys.max()
                ax = max(0, min(bx2, x + ts) - max(bx1, x))
                ay = max(0, min(by2, y + ts) - max(by1, y))
                cov = ax * ay / max(1e-6, (bx2 - bx1) * (by2 - by1))
                if cov < 0.1:
                    continue
                s = r.copy()
                s[1::2] = np.clip(s[1::2] - x, 0, ts) / ts
                s[2::2] = np.clip(s[2::2] - y, 0, ts) / ts
                ref_rows.append(s)
            ref = (np.stack(ref_rows) if ref_rows
                   else np.zeros((0, 9)))
            np.testing.assert_allclose(got[t], ref, atol=1e-12)

    def test_coverage_filter_drops_slivers(self):
        ts = 100
        grid = np.array([[0, 0]])
        # midpoint inside tile but only a tiny fraction of AABB covered:
        # box spanning x in [95, 300]? midpoint (x1+x4)/2 must be < 100.
        # x1=-150, x4=200 -> mid=25; AABB x in [-150, 300], y in [10,20]
        # covered x-range [0,100] -> frac = 100/450 = 0.22 > 0.1 (kept)
        box = [0, -150, 10, 300, 10, 300, 20, 200, 20]
        out = T.assign_labels_to_tiles(
            np.array([box], dtype=np.float64), grid, ts, 0.1)
        assert len(out[0]) == 1
        out2 = T.assign_labels_to_tiles(
            np.array([box], dtype=np.float64), grid, ts, 0.25)
        assert len(out2[0]) == 0

    def test_empty_labels(self):
        out = T.assign_labels_to_tiles(
            np.zeros((0, 9)), np.array([[0, 0]]), 100, 0.1)
        assert len(out) == 1 and out[0].shape == (0, 9)


class TestExtractVariants:
    def test_rowgather_matches_dynamic_slice(self):
        rng = np.random.RandomState(7)
        img = rng.randint(0, 255, (100, 120, 3)).astype(np.uint8)
        grid = T.inference_tile_grid(100, 120, 64, 16)
        a = np.asarray(T.extract_tiles(
            jnp.asarray(img), jnp.asarray(grid[:, :2]), 64))
        b = np.asarray(T.extract_tiles_rowgather(
            jnp.asarray(img), jnp.asarray(grid[:, :2]), 64))
        np.testing.assert_array_equal(a, b)
