"""Conv+BN inference folding (models/fold.py — the engine's fuse()).

VERDICT r03 weak #3: BN ran as a separate affine inside every post-conv
fusion. Folding must leave the network function unchanged to fp
tolerance and the detector output detections equivalent.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oriented_object_detection_tpu.config import DetectConfig, ScaleConfig
from oriented_object_detection_tpu.models import YOLO11OBB
from oriented_object_detection_tpu.models.fold import fold_bn_variables
from oriented_object_detection_tpu.models.layers import BN_EPS


def _np_tree(t):
    return jax.tree.map(np.asarray, t)


@pytest.fixture(scope="module")
def model_vars():
    m = YOLO11OBB(nc=12, scale="n", in_channels=3)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    # make BN stats non-trivial so the fold actually moves numbers
    rng = np.random.RandomState(1)
    v = _np_tree(v)

    def jitter(node):
        if isinstance(node, dict):
            if "mean" in node and "var" in node:
                node["mean"] = node["mean"] + rng.randn(
                    *node["mean"].shape).astype(node["mean"].dtype) * 0.3
                node["var"] = node["var"] * np.exp(rng.randn(
                    *node["var"].shape).astype(node["var"].dtype) * 0.2)
            for s in node.values():
                jitter(s)

    jitter(v["batch_stats"])
    return m, v


class TestFoldMath:
    def test_network_function_unchanged(self, model_vars):
        m, v = model_vars
        folded = fold_bn_variables(v)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                        jnp.float32)
        out1 = jax.jit(m.apply)(v, x)
        out2 = jax.jit(m.apply)(folded, x)
        for key in ("cls", "box", "ang"):
            for a, b in zip(out1[key], out2[key]):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)

    def test_bn_neutralized(self, model_vars):
        _, v = model_vars
        folded = fold_bn_variables(v)

        def check(pnode, snode):
            if not isinstance(pnode, dict):
                return
            if "scale" in pnode and isinstance(snode, dict) \
                    and "mean" in snode:
                np.testing.assert_array_equal(pnode["scale"],
                                              np.ones_like(pnode["scale"]))
                np.testing.assert_array_equal(snode["mean"],
                                              np.zeros_like(snode["mean"]))
                np.testing.assert_allclose(snode["var"], 1.0 - BN_EPS,
                                           rtol=1e-6)
            for k, s in pnode.items():
                if isinstance(s, dict):
                    check(s, snode.get(k, {}) if isinstance(snode, dict)
                          else {})

        check(folded["params"], folded["batch_stats"])

    def test_input_not_mutated(self, model_vars):
        _, v = model_vars
        before = np.asarray(
            v["params"]["l0"]["conv"]["kernel"]).copy()
        fold_bn_variables(v)
        np.testing.assert_array_equal(
            np.asarray(v["params"]["l0"]["conv"]["kernel"]), before)


CKPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "assets", "bench_ckpts", "train128.ckpt")


@pytest.mark.skipif(not os.path.exists(CKPT), reason="bench asset missing")
def test_detector_folded_matches_unfolded():
    """TiledDetector with fold_bn reproduces the unfolded detections on
    the trained checkpoint (same counts, same boxes to fp tolerance)."""
    pytest.importorskip("cv2")
    from oriented_object_detection_tpu.infer.pipeline import TiledDetector
    from oriented_object_detection_tpu.train.trainer import load_checkpoint
    from tools.train_synthetic import gen_map

    ck = load_checkpoint(CKPT)
    scale = ck["extra"].get("model_scale", "n")
    params = {128: {"params": ck["params"],
                    "batch_stats": ck["batch_stats"]}}
    img = gen_map(np.random.RandomState(7), H=400, W=500, n_obj=12)[0]
    import dataclasses
    base = DetectConfig(scales=(ScaleConfig(128, 30, model_scale=scale),),
                        channels=3, compute_dtype="float32", fold_bn=False)
    out0 = TiledDetector(base, params, max_det=32,
                         pre_topk=64).detect_image(img)["merged_for_pr"]
    cfgf = dataclasses.replace(base, fold_bn=True)
    out1 = TiledDetector(cfgf, params, max_det=32,
                         pre_topk=64).detect_image(img)["merged_for_pr"]
    assert len(out0) > 0
    assert out0.shape == out1.shape
    np.testing.assert_allclose(out0, out1, rtol=1e-3, atol=5e-3)


def test_fused_graph_matches_batchnorm_graph(model_vars):
    """YOLO11OBB(fused_bn=True) on FOLDED params must reproduce the
    BatchNorm graph on the original params (the graph-level engine
    fuse(): ConvBN becomes conv -> +bias -> SiLU)."""
    _, v = model_vars
    base = YOLO11OBB(nc=12, scale="n", in_channels=3)
    fused = YOLO11OBB(nc=12, scale="n", in_channels=3, fused_bn=True)
    folded = fold_bn_variables(v)
    x = jnp.asarray(np.random.RandomState(3).rand(2, 64, 64, 3),
                    jnp.float32)
    out1 = jax.jit(base.apply)(v, x)
    out2 = jax.jit(fused.apply)(folded, x)
    for key in ("cls", "box", "ang"):
        for a, b in zip(out1[key], out2[key]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3)
    # and fused_bn on UNFOLDED params must NOT silently equal the base
    # (guards against the flag being a no-op)
    out3 = jax.jit(fused.apply)(v, x)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(out1["cls"], out3["cls"])]
    assert max(diffs) > 1e-3, "fused_bn flag appears to be a no-op"


def test_fused_graph_param_tree_identical(model_vars):
    """init trees of the fused and standard graphs must match exactly
    (same keys, shapes) so folded checkpoints apply to either."""
    _, v = model_vars
    fused = YOLO11OBB(nc=12, scale="n", in_channels=3, fused_bn=True)
    v2 = fused.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    import jax.tree_util as jtu

    f1 = {jtu.keystr(p): np.shape(a)
          for p, a in jtu.tree_flatten_with_path(v)[0]}
    f2 = {jtu.keystr(p): np.shape(a)
          for p, a in jtu.tree_flatten_with_path(v2)[0]}
    assert f1 == f2
