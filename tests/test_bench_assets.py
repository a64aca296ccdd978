"""Distilled bench checkpoint assets (tools/distill_bench_ckpt.py).

`runs/` is gitignored and cleaned between driver sessions; the bench's
trained-checkpoint headline (VERDICT r02 #4) must survive that via the
committed fp16 assets under assets/bench_ckpts/. These tests cover the
distill transform and bench._build_detector's fallback + fp32 upcast.
"""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from oriented_object_detection_tpu.config import TrainConfig
from oriented_object_detection_tpu.train import trainer as TR
from tools.distill_bench_ckpt import distill


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("ck")
    cfg = TrainConfig(tile_size=64, model_scale="n", channels=3,
                      compute_dtype="float32")
    _, state, _ = TR.create_train_state(cfg, jax.random.PRNGKey(0))
    src = str(root / "best.ckpt")
    TR.save_checkpoint(src, state, {"model_scale": "n", "channels": 3,
                                    "tile_size": 64})
    return src, state


class TestDistill:
    def test_strips_and_halves(self, tiny_ckpt, tmp_path):
        src, state = tiny_ckpt
        dst = str(tmp_path / "train64.ckpt")
        payload = distill(src, dst)
        assert payload["ema_params"] is None
        assert "opt_state" not in payload
        assert payload["extra"]["distilled_fp16"] is True
        assert payload["extra"]["tile_size"] == 64
        # every fp32 leaf became fp16, values match the EMA tree to fp16
        ema_leaves = jax.tree.leaves(state.ema_params)
        out_leaves = jax.tree.leaves(payload["params"])
        assert len(ema_leaves) == len(out_leaves)
        for a, b in zip(ema_leaves, out_leaves):
            a = np.asarray(a)
            if a.dtype == np.float32:
                assert b.dtype == np.float16
                np.testing.assert_array_equal(a.astype(np.float16), b)
        assert os.path.getsize(dst) < os.path.getsize(src)

    def test_bench_fallback_loads_asset_as_fp32(self, tiny_ckpt, tmp_path,
                                                monkeypatch):
        """bench._build_detector finds assets/bench_ckpts/train{ts}.ckpt
        when runs/obb/train{ts}/best.ckpt is absent and upcasts to fp32."""
        src, _ = tiny_ckpt
        monkeypatch.chdir(tmp_path)
        distill(src, str(tmp_path / "assets/bench_ckpts/train64.ckpt"))

        import bench
        from oriented_object_detection_tpu.config import (DetectConfig,
                                                          ScaleConfig)

        cfg = DetectConfig(scales=(ScaleConfig(64, 16, model_scale="n"),),
                           channels=3, compute_dtype="float32")
        det, weights = bench._build_detector(cfg, calibrate=False,
                                             use_ckpt=True)
        assert det is not None and "ckpt[n]" in weights
        leaves = jax.tree.leaves(det.params[64]["params"])
        assert all(np.asarray(x).dtype != np.float16 for x in leaves)

    def test_bench_missing_everywhere_skips(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)

        import bench
        from oriented_object_detection_tpu.config import (DetectConfig,
                                                          ScaleConfig)

        cfg = DetectConfig(scales=(ScaleConfig(64, 16, model_scale="n"),),
                           channels=3, compute_dtype="float32")
        det, reason = bench._build_detector(cfg, calibrate=False,
                                            use_ckpt=True)
        assert det is None and "missing" in reason

    def test_bench_4ch_suffix_lookup(self, tmp_path, monkeypatch):
        """Non-3ch configs look for channel-suffixed assets
        (train{ts}_4ch.ckpt) so a 4ch checkpoint can never be applied to
        a 3ch stem by name collision."""
        cfg4 = TrainConfig(tile_size=64, model_scale="n", channels=4,
                           compute_dtype="float32")
        _, state, _ = TR.create_train_state(cfg4, jax.random.PRNGKey(1))
        src = str(tmp_path / "best.ckpt")
        TR.save_checkpoint(src, state, {"model_scale": "n", "channels": 4,
                                        "tile_size": 64})
        monkeypatch.chdir(tmp_path)
        distill(src, str(tmp_path / "assets/bench_ckpts/train64_4ch.ckpt"))

        import bench
        from oriented_object_detection_tpu.config import (DetectConfig,
                                                          ScaleConfig)

        cfg = DetectConfig(scales=(ScaleConfig(64, 16, model_scale="n"),),
                           channels=4, compute_dtype="float32")
        det, weights = bench._build_detector(cfg, calibrate=False,
                                             use_ckpt=True)
        assert det is not None and "ckpt[n]" in weights
        # and the unsuffixed 3ch config must NOT pick the 4ch asset up
        cfg3 = DetectConfig(scales=(ScaleConfig(64, 16, model_scale="n"),),
                            channels=3, compute_dtype="float32")
        det3, reason = bench._build_detector(cfg3, calibrate=False,
                                             use_ckpt=True)
        assert det3 is None and "missing" in reason

    def test_mismatched_live_run_falls_through_to_asset(self, tiny_ckpt,
                                                        tmp_path,
                                                        monkeypatch):
        """A 4ch training left in the UNSUFFIXED default run dir must not
        disable the 3ch trained sections: the arch-mismatch candidate is
        skipped and the matching committed asset wins."""
        src3, _ = tiny_ckpt
        cfg4 = TrainConfig(tile_size=64, model_scale="n", channels=4,
                           compute_dtype="float32")
        _, st4, _ = TR.create_train_state(cfg4, jax.random.PRNGKey(2))
        monkeypatch.chdir(tmp_path)
        os.makedirs("runs/obb/train64", exist_ok=True)
        TR.save_checkpoint("runs/obb/train64/best.ckpt", st4,
                           {"model_scale": "n", "channels": 4,
                            "tile_size": 64})
        distill(src3, str(tmp_path / "assets/bench_ckpts/train64.ckpt"))

        import bench
        from oriented_object_detection_tpu.config import (DetectConfig,
                                                          ScaleConfig)

        cfg = DetectConfig(scales=(ScaleConfig(64, 16, model_scale="n"),),
                           channels=3, compute_dtype="float32")
        det, weights = bench._build_detector(cfg, calibrate=False,
                                             use_ckpt=True)
        assert det is not None and "ckpt[n]" in weights
