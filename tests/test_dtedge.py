"""DT-Edge pipeline tests vs scipy/cv2 oracles."""

import os
import numpy as np
import pytest

import jax.numpy as jnp

from oriented_object_detection_tpu.ops import dtedge as DT
from oriented_object_detection_tpu.ops.edt import edt_l2
from oriented_object_detection_tpu.config import DTEdgeConfig

cv2 = pytest.importorskip("cv2")
scipy_nd = pytest.importorskip("scipy.ndimage")


class TestEDT:
    def test_exact_vs_scipy(self):
        rng = np.random.RandomState(0)
        mask = rng.rand(2, 40, 56) < 0.02  # sparse edge pixels
        mask[:, 0, 0] = True  # ensure nonempty
        got = np.asarray(edt_l2(jnp.asarray(mask)))
        for b in range(2):
            ref = scipy_nd.distance_transform_edt(~mask[b])
            np.testing.assert_allclose(got[b], ref, atol=1e-4)

    def test_pallas_interpret_matches_xla(self):
        from jax.experimental.pallas import tpu as pltpu

        rng = np.random.RandomState(1)
        mask = rng.rand(1, 16, 128) < 0.05
        mask[0, 3, 40] = True
        ref = np.asarray(edt_l2(jnp.asarray(mask)))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(edt_l2(jnp.asarray(mask), use_pallas=True))
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_all_edges(self):
        mask = np.ones((1, 8, 8), bool)
        got = np.asarray(edt_l2(jnp.asarray(mask)))
        np.testing.assert_allclose(got, 0.0)

    def test_pallas_banded_adversarial_masks(self):
        """The banded scan's radius bound must stay sound on masks that
        stress it: a single far pixel, a single column, one dense and one
        empty half (mixed radii across strips), and pad-straddling
        non-128-multiple widths."""
        from jax.experimental.pallas import tpu as pltpu

        rng = np.random.RandomState(7)
        single = np.zeros((1, 48, 300), bool)
        single[0, 30, 250] = True
        col = np.zeros((1, 32, 256), bool)
        col[0, :, 5] = True
        halves = np.zeros((1, 24, 512), bool)
        halves[0, :, 300:] = rng.rand(24, 212) < 0.2
        tile = rng.rand(2, 416, 416) < 0.1
        for mask in (single, col, halves, tile):
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(edt_l2(jnp.asarray(mask),
                                        use_pallas=True))
            for b in range(mask.shape[0]):
                ref = scipy_nd.distance_transform_edt(~mask[b])
                np.testing.assert_allclose(got[b], ref, atol=1e-3)


class TestPercentile:
    def test_bitsearch_matches_numpy(self):
        """Sort-free bit-search percentile == np.percentile (linear
        interpolation) on non-negative data, scalar and vector q."""
        rng = np.random.RandomState(3)
        for shape, scale in [((3, 40, 56), 1.0), ((1, 64, 64), 1e6),
                             ((2, 7, 9), 100.0)]:
            x = (np.abs(rng.randn(*shape)) * scale).astype(np.float32)
            x.flat[::7] = 0.0
            for q in [90.0, 65.0, (1.0, 99.0), 0.0, 100.0]:
                got = np.asarray(DT._percentile_hw(jnp.asarray(x), q))
                ref = np.percentile(
                    x.reshape(shape[0], -1).astype(np.float64), q,
                    axis=-1)
                if np.ndim(q) > 0:
                    ref = np.moveaxis(ref, 0, -1)
                denom = max(1e-9, float(np.abs(ref).max()))
                assert np.abs(got - ref).max() / denom < 1e-6, (shape, q)


class TestPrimitives:
    def test_gray_matches_cv2(self):
        rng = np.random.RandomState(2)
        bgr = rng.randint(0, 255, (1, 32, 40, 3)).astype(np.uint8)
        got = np.asarray(DT.bgr_to_gray_u8(jnp.asarray(bgr)))[0]
        ref = cv2.cvtColor(bgr[0], cv2.COLOR_BGR2GRAY)
        assert np.abs(got - ref).max() <= 1  # rounding mode at .5 boundary

    def test_gaussian_blur_close_to_cv2(self):
        rng = np.random.RandomState(3)
        g = rng.randint(0, 255, (48, 64)).astype(np.uint8)
        for sigma in (0.6, 1.2, 2.4):
            got = np.asarray(DT.gaussian_blur_u8(
                jnp.asarray(g[None].astype(np.float32)), sigma))[0]
            ref = cv2.GaussianBlur(g, (0, 0), sigma, sigma,
                                   borderType=cv2.BORDER_REFLECT_101)
            assert np.abs(got - ref.astype(np.float32)).max() <= 1, sigma

    def test_scharr_matches_cv2(self):
        rng = np.random.RandomState(4)
        g = rng.randint(0, 255, (32, 48)).astype(np.uint8)
        got = np.asarray(DT.scharr_magnitude(
            jnp.asarray(g[None].astype(np.float32))))[0]
        ref = cv2.magnitude(cv2.Scharr(g, cv2.CV_32F, 1, 0),
                            cv2.Scharr(g, cv2.CV_32F, 0, 1))
        np.testing.assert_allclose(got, ref, atol=1e-2)

    def test_morph_open_matches_cv2(self):
        rng = np.random.RandomState(5)
        m = (rng.rand(40, 40) < 0.3).astype(np.uint8) * 255
        k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
        ref = cv2.morphologyEx(m, cv2.MORPH_OPEN, k, iterations=1) > 0
        got = np.asarray(DT.morph_open_cross(jnp.asarray(m[None] > 0)))[0]
        np.testing.assert_array_equal(got, ref)


class TestFullChannel:
    def _oracle(self, bgr, cfg: DTEdgeConfig):
        """Mirror of Detect_OBB.py:87-133 (percentile branch), with cv2."""
        gray = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
        acc = None
        for s in cfg.sigmas:
            blur = cv2.GaussianBlur(
                gray, (0, 0), s, s,
                borderType=cv2.BORDER_REFLECT_101) if s > 0 else gray
            mag = cv2.magnitude(cv2.Scharr(blur, cv2.CV_32F, 1, 0),
                                cv2.Scharr(blur, cv2.CV_32F, 0, 1))
            acc = mag if acc is None else np.maximum(acc, mag)
        lo, hi = np.percentile(acc, [cfg.p_lo, cfg.p_hi])
        edges = (acc >= hi).astype(np.uint8) * 255
        k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
        edges = cv2.morphologyEx(edges, cv2.MORPH_OPEN, k,
                                 iterations=cfg.morph_open)
        non_edge = cv2.threshold(edges, 0, 255, cv2.THRESH_BINARY_INV)[1]
        # oracle uses EXACT edt (scipy) so only the chamfer approx differs
        dist = scipy_nd.distance_transform_edt(non_edge > 0).astype(
            np.float32)
        lo, hi = np.percentile(dist, [1, 99])
        dist = np.clip((dist - lo) / max(1e-6, hi - lo), 0, 1)
        soft = np.exp(-dist / cfg.tau)
        acc_nrm = cv2.normalize(acc, None, 0, 1, cv2.NORM_MINMAX)
        soft = np.clip(0.7 * soft + 0.3 * acc_nrm, 0, 1)
        return (soft * 255).astype(np.uint8)

    def test_matches_oracle(self):
        rng = np.random.RandomState(6)
        # structured image: blobs on background, not pure noise
        img = np.full((64, 80, 3), 200, np.uint8)
        for _ in range(12):
            c = (rng.randint(5, 75), rng.randint(5, 59))
            cv2.circle(img, c, rng.randint(2, 8),
                       tuple(int(v) for v in rng.randint(0, 255, 3)), -1)
        cfg = DTEdgeConfig()
        got = np.asarray(DT.dt_edge_channel(jnp.asarray(img[None]), cfg))[0]
        ref = self._oracle(img, cfg).astype(np.float64)
        # tolerance: uint8 rounding chains; demand close agreement
        diff = np.abs(got - ref)
        assert np.median(diff) <= 1.0
        assert (diff <= 3).mean() > 0.97, (diff.max(), (diff > 3).mean())

    def test_build_multich_shapes(self):
        img = np.zeros((2, 32, 32, 3), np.uint8)
        out3 = np.asarray(DT.build_multich(jnp.asarray(img), 3))
        assert out3.shape == (2, 32, 32, 3)
        out4 = np.asarray(DT.build_multich(jnp.asarray(img), 4))
        assert out4.shape == (2, 32, 32, 4)

    def test_multich_rgb_order(self):
        img = np.zeros((1, 8, 8, 3), np.uint8)
        img[..., 0] = 10  # B
        img[..., 2] = 30  # R
        out = np.asarray(DT.build_multich(jnp.asarray(img), 3))
        assert out[0, 0, 0, 0] == 30 and out[0, 0, 0, 2] == 10

    def test_default_use_pallas_shape_aware(self, monkeypatch):
        """Auto EDT selection: chunked-XLA at tile widths, banded Pallas
        at map widths — on TPU only (measured crossover, see
        ops/dtedge._PALLAS_MIN_W)."""
        import jax

        # CPU backend (this test env): always False
        assert DT.default_use_pallas() is False
        assert DT.default_use_pallas((1, 4096, 4096)) is False

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert DT.default_use_pallas() is True              # map-scale default
        assert DT.default_use_pallas((128, 416, 416)) is False
        assert DT.default_use_pallas((128, 512, 512)) is False
        assert DT.default_use_pallas((1, 2048, 4096)) is True
        assert DT.default_use_pallas((1, 1024, 1024)) is True


REF_TEST1 = "/root/reference/Input/Test1.png"


@pytest.mark.skipif(not os.path.exists(REF_TEST1),
                    reason="reference golden inputs not present")
class TestRealScanPixels:
    """VERDICT r03 missing #1 (in-control part): the DT-Edge channel must
    behave sanely on the REAL scanned-map pixels (`Input/Test1.png`) —
    synthetic maps exercise the percentile/Otsu binarization with very
    different gradient statistics than a scanned geological map."""

    def _crops(self):
        img = cv2.imread(REF_TEST1)
        assert img is not None and img.shape == (807, 895, 3)
        # one content-dense crop and one from the map interior
        return np.stack([img[100:516, 200:616], img[300:716, 400:816]])

    def test_dtedge_real_pixels_sane(self):
        crops = self._crops()
        cfg = DTEdgeConfig()
        dt = np.asarray(DT.dt_edge_channel(jnp.asarray(crops), cfg))
        assert dt.shape == (2, 416, 416)
        for k in range(2):
            ch = dt[k]
            # nonconstant, full-ish dynamic range
            assert ch.std() > 10.0, f"crop {k}: DT channel nearly constant"
            assert ch.min() >= 0 and ch.max() <= 255
            assert ch.max() - ch.min() > 100, f"crop {k}: collapsed range"

    def test_percentile_threshold_not_saturated(self):
        crops = self._crops()
        cfg = DTEdgeConfig()
        gray = DT.bgr_to_gray_u8(jnp.asarray(crops))
        acc = DT.multi_scale_scharr(gray, cfg.sigmas)
        edges = np.asarray(DT.binarize_percentile(acc, cfg.p_hi))
        for k in range(2):
            frac = edges[k].mean()
            # p_hi=90 targets ~10% edge pixels; saturation to ~0 or ~1
            # means the threshold landed outside the gradient range
            assert 0.005 < frac < 0.5, (
                f"crop {k}: edge fraction {frac:.4f} saturated")
        # distance normalization must not be degenerate (1-99 pct spread)
        dist = np.asarray(edt_l2(DT.morph_open_cross(
            jnp.asarray(edges), cfg.morph_open)))
        for k in range(2):
            lo, hi = np.percentile(dist[k], [1, 99])
            assert hi - lo > 1.0, f"crop {k}: distance spread degenerate"

    def test_otsu_real_pixels(self):
        crops = self._crops()
        gray = DT.bgr_to_gray_u8(jnp.asarray(crops))
        acc = DT.multi_scale_scharr(gray, DTEdgeConfig().sigmas)
        edges = np.asarray(DT.binarize_otsu(acc))
        for k in range(2):
            frac = edges[k].mean()
            assert 0.005 < frac < 0.6, (
                f"crop {k}: otsu edge fraction {frac:.4f} saturated")
