"""Model family smoke tests: shapes, parameter counts, decode chain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oriented_object_detection_tpu.models import YOLO11OBB
from oriented_object_detection_tpu.models import decode as D


def init_model(scale="n", in_ch=3, nc=12, size=64):
    m = YOLO11OBB(nc=nc, scale=scale, in_channels=in_ch)
    x = jnp.zeros((1, size, size, in_ch), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    return m, variables, x


def n_params(variables):
    return sum(int(np.prod(p.shape))
               for p in jax.tree.leaves(variables["params"]))


class TestArchitecture:
    def test_output_shapes(self):
        m, v, x = init_model("n", size=64)
        out = m.apply(v, x)
        for i, s in enumerate((8, 16, 32)):
            assert out["box"][i].shape == (1, 64 // s, 64 // s, 64)
            assert out["cls"][i].shape == (1, 64 // s, 64 // s, 12)
            assert out["ang"][i].shape == (1, 64 // s, 64 // s, 1)

    def test_param_count_n(self):
        # yolo11n-obb reports ~2.7M params
        _, v, _ = init_model("n")
        p = n_params(v)
        assert 2.0e6 < p < 3.5e6, p

    @pytest.mark.slow
    def test_param_count_x(self):
        # yolo11x-obb reports ~58.8M params
        _, v, _ = init_model("x")
        p = n_params(v)
        assert 5.0e7 < p < 6.5e7, p

    def test_4ch_stem(self):
        m, v, x = init_model("n", in_ch=4)
        out = m.apply(v, x)
        assert out["cls"][0].shape[-1] == 12


class TestDecode:
    def test_anchors(self):
        pts, st = D.make_anchors(64)
        assert pts.shape == (8 * 8 + 4 * 4 + 2 * 2, 2)
        np.testing.assert_allclose(np.asarray(pts[0]), [0.5, 0.5])
        assert float(st[0]) == 8 and float(st[-1]) == 32

    def test_dfl_expectation(self):
        logits = np.full((1, 4 * 16), -1e9, np.float32)
        # put all mass on bin 5 for each of the 4 distances
        for d in range(4):
            logits[0, d * 16 + 5] = 0.0
        out = np.asarray(D.dfl_expectation(jnp.asarray(
            logits.reshape(1, 64))))
        np.testing.assert_allclose(out, 5.0, atol=1e-5)

    def test_angle_range(self):
        a = np.asarray(D.decode_angle(jnp.array([-100.0, 0.0, 100.0])))
        assert a[0] == pytest.approx(-np.pi / 4, abs=1e-5)
        assert a[1] == pytest.approx(np.pi / 4, abs=1e-5)
        assert a[2] == pytest.approx(3 * np.pi / 4, abs=1e-3)

    def test_dist2rbox_axis_aligned(self):
        # anchor at (10, 10), ltrb = (2, 3, 4, 5), angle 0
        out = np.asarray(D.dist2rbox(
            jnp.array([2.0, 3, 4, 5]), jnp.array(0.0),
            jnp.array([10.0, 10.0])))
        np.testing.assert_allclose(out, [11.0, 11.0, 6.0, 8.0, 0.0],
                                   atol=1e-6)

    def test_full_chain_shapes(self):
        m, v, x = init_model("n", size=64)
        out = m.apply(v, x)
        rbox, scores = D.decode_raw(out, 64)
        A = 64 + 16 + 4
        assert rbox.shape == (1, A, 5)
        assert scores.shape == (1, A, 12)
        dets = D.postprocess_batch(rbox, scores, 0.25, 0.7,
                                   max_det=32, pre_topk=64)
        assert dets["corners8"].shape == (1, 32, 8)
        assert dets["valid"].shape == (1, 32)

    def test_postprocess_suppresses_duplicates(self):
        # two identical high-conf boxes same class -> one kept
        rbox = jnp.asarray(np.tile(
            np.array([[32.0, 32, 10, 6, 0.2]]), (2, 1))[None])
        scores = np.zeros((1, 2, 12), np.float32)
        scores[0, :, 3] = [0.9, 0.8]
        # invert sigmoid to feed scores directly: postprocess takes scores
        dets = D.postprocess_batch(rbox, jnp.asarray(scores), 0.25, 0.7,
                                   max_det=8, pre_topk=2)
        assert int(dets["valid"].sum()) == 1
        assert int(dets["cls"][0, 0]) == 3
