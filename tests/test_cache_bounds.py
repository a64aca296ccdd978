"""Bounded-cache regression tests (VERDICT r03 weak #6).

Long-lived processes (dataset-scale eval sweeps, multi-config bench
sections) must not accumulate compiled programs / device scalars / IoU
matrices without bound. GTCache's LRU is covered in test_metrics.py;
these pin the other two caches.
"""

import numpy as np

from oriented_object_detection_tpu.eval import val as V


def test_val_infer_cache_bounded_lru():
    saved = dict(V._INFER_CACHE)
    V._INFER_CACHE.clear()
    try:
        n = V._INFER_CACHE_MAX + 7
        for i in range(n):
            got = V._cache_put(("model", 64, i), lambda i=i: f"prog{i}")
            assert got == f"prog{i}"
        assert len(V._INFER_CACHE) == V._INFER_CACHE_MAX
        # oldest evicted, newest kept
        assert ("model", 64, 0) not in V._INFER_CACHE
        assert ("model", 64, n - 1) in V._INFER_CACHE
        # a hit returns the cached object without re-invoking the factory
        def boom():
            raise AssertionError("factory re-invoked on cache hit")
        assert V._cache_put(("model", 64, n - 1), boom) == f"prog{n - 1}"
    finally:
        V._INFER_CACHE.clear()
        V._INFER_CACHE.update(saved)


def test_conf_scalar_cache_bounded():
    import jax

    from oriented_object_detection_tpu.config import (DetectConfig,
                                                      ScaleConfig)
    from oriented_object_detection_tpu.infer import pipeline as P
    from oriented_object_detection_tpu.models import YOLO11OBB

    cfg = DetectConfig(scales=(ScaleConfig(64, 16, model_scale="n"),),
                       channels=3)
    m = YOLO11OBB(nc=cfg.nc, scale="n", in_channels=3)
    v = m.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    det = P.TiledDetector(cfg, {64: v}, max_det=16, pre_topk=32)
    for i in range(40):
        det._conf_scalar(round(0.001 * i, 6))
    assert len(det._conf_cache) <= 32
    v = det._conf_scalar(round(0.001 * 39, 6))   # most-recent still cached
    assert np.isclose(float(v), 0.039)
