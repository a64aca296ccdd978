"""Letterbox + elastic transform tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oriented_object_detection_tpu.ops import image as I

cv2 = pytest.importorskip("cv2")


class TestLetterbox:
    def test_square_noop(self):
        img = np.random.RandomState(0).randint(
            0, 255, (64, 64, 3)).astype(np.uint8)
        out, r, (dw, dh) = I.letterbox(jnp.asarray(img), 64)
        assert r == 1.0 and dw == 0 and dh == 0
        np.testing.assert_allclose(np.asarray(out), img, atol=1e-4)

    def test_wide_image_padded(self):
        img = np.full((40, 80, 3), 50, np.uint8)
        out, r, (dw, dh) = I.letterbox(jnp.asarray(img), 80)
        assert r == 1.0
        o = np.asarray(out)
        assert o.shape == (80, 80, 3)
        # top and bottom bands are pad 114
        assert (o[:dh] == 114).all() and (o[dh + 40:] == 114).all()
        assert (o[dh:dh + 40] == 50).all()

    def test_scaleup_and_back_mapping(self):
        img = np.zeros((100, 150, 3), np.uint8)
        out, r, (dw, dh) = I.letterbox(jnp.asarray(img), 416)
        assert abs(r - 416 / 150) < 1e-9
        # a point at original (150, 100) maps inside the canvas
        x = 150 * r + dw
        y = 100 * r + dh
        assert 0 <= x <= 416 and 0 <= y <= 416


class TestElastic:
    def test_runs_and_preserves_range(self):
        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (48, 48, 3)).astype(np.uint8)
        out = np.asarray(I.elastic_transform(
            jnp.asarray(img), jax.random.PRNGKey(0)))
        assert out.shape == img.shape
        assert out.min() >= 0 and out.max() <= 255

    def test_zero_alpha_identity(self):
        img = np.random.RandomState(2).randint(
            0, 255, (32, 32, 1)).astype(np.uint8)
        out = np.asarray(I.elastic_transform(
            jnp.asarray(img), jax.random.PRNGKey(1), alpha=0.0,
            sigma=1.0))
        np.testing.assert_allclose(out[..., 0], img[..., 0], atol=1e-3)


class TestWarpAffine:
    """ops/warp.py: deterministic fixed-point affine warp (the device
    mosaic resample)."""

    def _rand_case(self, rng):
        H = W = int(rng.choice([64, 97, 128]))
        C = int(rng.choice([1, 3, 4]))
        img = rng.randint(0, 256, (H, W, C), np.uint8)
        ts = int(rng.choice([48, 64]))
        s = rng.uniform(0.5, 1.5)
        tx = ts * (0.5 + rng.uniform(-0.1, 0.1)) - s * ts
        ty = ts * (0.5 + rng.uniform(-0.1, 0.1)) - s * ts
        M = np.array([[s, 0, tx], [0, s, ty]], np.float32)
        return img, M, ts, C

    def test_device_matches_numpy_mirror_bitexact(self):
        from oriented_object_detection_tpu.ops import warp as W

        rng = np.random.RandomState(11)
        for _ in range(6):
            img, M, ts, C = self._rand_case(rng)
            ours_np = W.warp_affine_u8_np(img, W.invert_affine(M), ts, ts,
                                          (114,) * C)
            ours_dev = np.asarray(
                W.warp_affine_u8(img, M, ts, ts, (114,) * C))
            assert (ours_np == ours_dev).all()

    def test_within_one_gray_level_of_cv2(self):
        from oriented_object_detection_tpu.ops import warp as W

        rng = np.random.RandomState(12)
        for _ in range(6):
            img, M, ts, C = self._rand_case(rng)
            ref = cv2.warpAffine(img, M, (ts, ts), borderValue=(114,) * C)
            if ref.ndim == 2:
                ref = ref[..., None]
            ours = W.warp_affine_u8_np(img, W.invert_affine(M), ts, ts,
                                       (114,) * C)
            assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1

    def test_identity_matrix_is_copy(self):
        from oriented_object_detection_tpu.ops import warp as W

        rng = np.random.RandomState(13)
        img = rng.randint(0, 256, (32, 32, 3), np.uint8)
        M = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float64)
        out = W.warp_affine_u8_np(img, W.invert_affine(M), 32, 32,
                                  (114,) * 3)
        assert (out == img).all()

    def test_constant_border(self):
        from oriented_object_detection_tpu.ops import warp as W

        img = np.full((8, 8, 3), 200, np.uint8)
        # shift far out of range: everything is border
        M = np.array([[1.0, 0, 100.0], [0, 1.0, 100.0]], np.float64)
        out = W.warp_affine_u8_np(img, W.invert_affine(M), 8, 8, (114,) * 3)
        assert (out == 114).all()

    def test_axis_aligned_fast_path_bitexact(self):
        """warp_axis_aligned_u8_dev (the r05 mosaic hot path: two 1-D
        axis gathers) must be BIT-IDENTICAL to the general per-pixel
        warp for every scale+translate affine, including ones that
        sample far outside the image (border factorization)."""
        import jax.numpy as jnp

        from oriented_object_detection_tpu.ops import warp as W

        rng = np.random.RandomState(21)
        cases = [self._rand_case(rng) for _ in range(5)]
        # adversarial: whole output out of range / half out of range
        img = rng.randint(0, 256, (64, 64, 3), np.uint8)
        cases.append((img, np.array([[1.0, 0, 200.0], [0, 1.0, 200.0]]),
                      48, 3))
        cases.append((img, np.array([[0.7, 0, -20.0], [0, 1.3, 40.0]]),
                      48, 3))
        for img, M, ts, C in cases:
            ad, bd, X0, Y0 = W.affine_deltas(W.invert_affine(M), ts, ts)
            assert (bd == 0).all() and (X0 == X0[0]).all()  # axis-aligned
            args = (jnp.asarray(ad), jnp.asarray(bd), jnp.asarray(X0),
                    jnp.asarray(Y0))
            general = np.asarray(W.warp_affine_u8_dev(
                jnp.asarray(img), *args, (114,) * C))
            fast = np.asarray(W.warp_axis_aligned_u8_dev(
                jnp.asarray(img), args[0], args[2], args[3], (114,) * C))
            assert (general == fast).all()
