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
