"""Native C++ geometry library vs the JAX kernels."""

import numpy as np
import pytest

import jax.numpy as jnp

from oriented_object_detection_tpu.ops import geometry as G
from oriented_object_detection_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


def random_rects(rng, n):
    b = np.stack([
        np.array([rng.uniform(10, 90), rng.uniform(10, 90),
                  rng.uniform(2, 40), rng.uniform(2, 40),
                  rng.uniform(-np.pi, np.pi)]) for _ in range(n)])
    return np.asarray(G.xywhr_to_corners8(jnp.asarray(b)))


def test_iou_matrix_matches_jax():
    rng = np.random.RandomState(0)
    a = random_rects(rng, 40)
    b = random_rects(rng, 30)
    got = native.quad_iou_matrix(a, b)
    ref = np.asarray(G.quad_iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_self_intersecting_zero():
    bowtie = np.array([[0.0, 0, 10, 10, 10, 0, 0, 10]])
    rect = np.array([[0.0, 0, 10, 0, 10, 10, 0, 10]])
    assert native.quad_iou_matrix(bowtie, rect)[0, 0] == 0.0


def test_greedy_nms_matches_host_merge():
    from oriented_object_detection_tpu.infer import fusion as F

    rng = np.random.RandomState(1)
    c8 = random_rects(rng, 50)
    dets = np.concatenate([
        c8, rng.randint(0, 3, (50, 1)).astype(float),
        rng.rand(50, 1), np.zeros((50, 1))], axis=1)
    keep = native.greedy_nms(dets, 0.4)
    ref = F.merge_detections(dets, 0.4)
    np.testing.assert_allclose(dets[keep], ref, atol=1e-12)
