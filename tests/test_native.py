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


def test_grouped_nms_matches_per_group_loop():
    """The single-call grouped merge (detect_stream critical path) must
    be bit-identical to running merge_detections per tile group."""
    from oriented_object_detection_tpu.infer import fusion as F

    rng = np.random.RandomState(7)
    parts = []
    for tid in range(25):
        n = rng.randint(0, 9)
        if n == 0:
            continue
        c8 = random_rects(rng, n)
        d = np.concatenate([
            c8, rng.randint(0, 3, (n, 1)).astype(float),
            rng.rand(n, 1), np.zeros((n, 1)),
            np.full((n, 1), float(tid))], axis=1)
        parts.append(d)
    flat = np.concatenate(parts)
    order = np.lexsort((-flat[:, 9], flat[:, 11]))
    flat = flat[order]

    keep = native.greedy_nms_grouped(
        np.ascontiguousarray(flat[:, :11]),
        flat[:, 11].astype(np.int32), 0.4)
    got = flat[keep][:, :11]

    rows = []
    for tid in np.unique(flat[:, 11]):
        rows.append(F.merge_detections(
            flat[flat[:, 11] == tid][:, :11], 0.4))
    ref = np.concatenate(rows)
    np.testing.assert_array_equal(got, ref)


class TestStaleLibGuard:
    def test_missing_symbols_degrade_to_none(self, monkeypatch):
        """A prebuilt libgeomobb.so that predates newer symbols must make
        the loader return None (callers fall back to Python paths), not
        crash with AttributeError mid-binding."""
        from oriented_object_detection_tpu.utils import native as NAT

        class _OldLib:
            quad_iou = None  # object() has no ctypes attrs at all

            def __getattr__(self, name):
                raise AttributeError(f"undefined symbol: {name}")

        monkeypatch.setattr(NAT, "_TRIED", False)
        monkeypatch.setattr(NAT, "_LIB", None)
        monkeypatch.setattr(NAT.subprocess, "run",
                            lambda *a, **k: None)
        monkeypatch.setattr(NAT.ctypes, "CDLL", lambda so: _OldLib())
        monkeypatch.setattr(NAT.os.path, "exists", lambda p: True)
        assert NAT._load() is None
        assert NAT.available() is False
        assert NAT.consensus_filter(
            np.zeros((1, 11)), np.zeros(1, np.int32), 0.4, 0.25,
            0.7) is None
        # restore module cache for subsequent tests in this process
        monkeypatch.undo()
        NAT._TRIED = False
        NAT._LIB = None
