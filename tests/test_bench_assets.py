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


class TestInt8Distill:
    """--int8 assets (the x-scale flagship ckpts: fp16 alone would cost
    ~118 MB per committed file) — per-output-channel symmetric int8 for
    large kernels, dequantized back to fp32 by load_checkpoint."""

    def test_int8_roundtrip_close_and_smaller(self, tiny_ckpt, tmp_path):
        src, state = tiny_ckpt
        dst16 = str(tmp_path / "f16.ckpt")
        dst8 = str(tmp_path / "i8.ckpt")
        distill(src, dst16)
        payload = distill(src, dst8, int8=True)
        # flags must be EXCLUSIVE: load_checkpoint branches on
        # distilled_fp16 first; both set would skip dequantization
        assert payload["extra"]["distilled_int8"] is True
        assert "distilled_fp16" not in payload["extra"]
        assert payload["q_scales"], "no leaf was quantized"
        assert os.path.getsize(dst8) < 0.7 * os.path.getsize(dst16)

        ck = TR.load_checkpoint(dst8)
        assert "q_scales" not in ck
        ema = jax.tree.leaves(jax.tree.map(np.asarray, state.ema_params))
        out = jax.tree.leaves(ck["params"])
        assert len(ema) == len(out)
        for a, b in zip(ema, out):
            a = np.asarray(a)
            if a.dtype != np.float32:
                continue
            assert np.asarray(b).dtype == np.float32
            # symmetric per-channel int8: |err| <= scale/2 = absmax/254
            scale = np.abs(a).max(axis=tuple(range(a.ndim - 1))) / 127.0 \
                if a.ndim >= 2 else None
            err = np.abs(np.asarray(b) - a)
            if a.ndim >= 2 and a.size >= 16384:
                assert (err <= scale * 0.5 + 1e-7).all()
            else:  # fp16 path
                assert err.max() <= np.abs(a).max() * 2e-3 + 1e-7

    def test_int8_of_fp16_source_upcasts_first(self, tiny_ckpt, tmp_path):
        """Distilling FROM an already-fp16 asset (the x-scale runs/ case)
        must still quantize the big kernels, not pass fp16 through."""
        src, _ = tiny_ckpt
        mid = str(tmp_path / "mid.ckpt")
        distill(src, mid)                      # fp16 asset
        payload = distill(mid, str(tmp_path / "i8.ckpt"), int8=True)
        assert payload["q_scales"], "fp16 source defeated quantization"
        assert "distilled_fp16" not in payload["extra"]

    def test_committed_x_assets_load_as_fp32(self):
        """The committed flagship assets themselves (skip if absent)."""
        for ts in (128, 416):
            path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "assets", "bench_ckpts", f"train{ts}_x.ckpt")
            if not os.path.exists(path):
                pytest.skip("x-scale assets not committed here")
            ck = TR.load_checkpoint(path)
            extra = ck["extra"]
            assert extra["model_scale"] == "x"
            assert extra["tile_size"] == ts
            leaves = jax.tree.leaves(ck["params"])
            assert all(np.asarray(x).dtype == np.float32 for x in leaves)
