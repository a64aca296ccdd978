"""Inference tile-batch sharding over the 8-device mesh must reproduce the
single-device results exactly."""

import numpy as np
import pytest

import jax

from oriented_object_detection_tpu.config import DetectConfig, ScaleConfig
from oriented_object_detection_tpu.infer.pipeline import TiledDetector
from oriented_object_detection_tpu.models import YOLO11OBB
from oriented_object_detection_tpu.parallel import mesh as PM


def test_sharded_matches_single():
    assert jax.device_count() >= 8
    cfg = DetectConfig(scales=(ScaleConfig(64, 16, model_scale="n"),),
                       channels=3)
    m = YOLO11OBB(nc=12, scale="n", in_channels=3)
    params = {64: m.init(jax.random.PRNGKey(0),
                         np.zeros((1, 64, 64, 3), np.float32))}
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (200, 260, 3)).astype(np.uint8)

    det1 = TiledDetector(cfg, params, max_det=16, pre_topk=32)
    out1 = det1.detect_image(img)["merged_for_pr"]

    mesh = PM.make_mesh()
    det8 = TiledDetector(cfg, params, max_det=16, pre_topk=32, mesh=mesh)
    with mesh:
        out8 = det8.detect_image(img)["merged_for_pr"]

    assert out1.shape == out8.shape
    np.testing.assert_allclose(out1, out8, rtol=1e-5, atol=1e-5)


def test_sharded_chunked_stream_matches_single():
    """The chunked pipelined stream must also work over the data mesh
    (tile batches device_put with the data-axis sharding) and reproduce
    the single-device per-image results."""
    assert jax.device_count() >= 8
    cfg = DetectConfig(scales=(ScaleConfig(64, 16, model_scale="n"),),
                       channels=3)
    m = YOLO11OBB(nc=12, scale="n", in_channels=3)
    params = {64: m.init(jax.random.PRNGKey(0),
                         np.zeros((1, 64, 64, 3), np.float32))}
    rng = np.random.RandomState(1)
    imgs = [rng.randint(0, 255, (200, 260, 3)).astype(np.uint8)
            for _ in range(4)]

    det1 = TiledDetector(cfg, params, max_det=16, pre_topk=32)
    singles = [det1.detect_image(im)["merged_for_pr"] for im in imgs]

    mesh = PM.make_mesh()
    det8 = TiledDetector(cfg, params, max_det=16, pre_topk=32, mesh=mesh)
    with mesh:
        streamed = [r["merged_for_pr"]
                    for r in det8.detect_stream(imgs, chunk=2)]

    assert len(streamed) == len(singles)
    for a, b in zip(streamed, singles):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
