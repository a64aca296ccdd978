"""End-to-end inference pipeline smoke tests (random-weight model, CPU)."""

import os

import numpy as np
import pytest

import jax

from oriented_object_detection_tpu.config import (DetectConfig, ScaleConfig)
from oriented_object_detection_tpu.infer import pipeline as P
from oriented_object_detection_tpu.models import YOLO11OBB

cv2 = pytest.importorskip("cv2")


def make_detector(scales, channels=3, metrics=False, model_scale="n"):
    import dataclasses
    cfg = DetectConfig(
        scales=tuple(ScaleConfig(ts, ov, model_scale=model_scale)
                     for ts, ov in scales),
        channels=channels, calculate_metrics=metrics)
    params = {}
    for sc in cfg.scales:
        m = YOLO11OBB(nc=cfg.nc, scale=sc.model_scale, in_channels=channels)
        x = np.zeros((1, sc.tile_size, sc.tile_size, channels), np.float32)
        params[sc.tile_size] = m.init(jax.random.PRNGKey(0), x)
    return P.TiledDetector(cfg, params, max_det=16, pre_topk=32)


class TestEndToEnd:
    def test_single_scale_runs(self):
        det = make_detector([(64, 16)])
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (100, 120, 3)).astype(np.uint8)
        out = det.detect_image(img)
        assert "merged_for_pr" in out
        dets = out["merged_for_pr"]
        assert dets.ndim == 2 and dets.shape[1] == 11

    def test_dual_scale_with_metrics_store(self, tmp_path):
        det = make_detector([(64, 16), (96, 24)], metrics=True)
        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (100, 100, 3)).astype(np.uint8)
        p = str(tmp_path / "img.png")
        cv2.imwrite(p, img)
        store = {}
        result = P.process_image(det, p, str(tmp_path), store=store)
        assert "merged_for_map" in result
        assert os.path.exists(tmp_path / "img_detected.jpg")
        assert os.path.exists(tmp_path / "img.xlsx")
        from oriented_object_detection_tpu.utils import xlsx
        rows = xlsx.read_xlsx(str(tmp_path / "img.xlsx"))
        assert rows[0] == P.XLSX_HEADER

    def test_4ch_path_runs(self):
        det = make_detector([(64, 16)], channels=4)
        rng = np.random.RandomState(2)
        img = rng.randint(0, 255, (80, 80, 3)).astype(np.uint8)
        out = det.detect_image(img)
        assert out["merged_for_pr"].shape[1] == 11

    def test_detections_within_image_or_margin(self):
        det = make_detector([(64, 16)])
        rng = np.random.RandomState(3)
        img = rng.randint(0, 255, (100, 120, 3)).astype(np.uint8)
        out = det.detect_image(img)
        dets = out["merged_for_pr"]
        if len(dets):
            # centers must be inside the image (border filter keeps
            # centers >= margin from tile borders)
            cx = dets[:, 0:8:2].mean(1)
            cy = dets[:, 1:8:2].mean(1)
            assert (cx >= 0).all() and (cx <= 120).all()
            assert (cy >= 0).all() and (cy <= 100).all()

    def test_strike_angle_only_for_strike(self):
        det = make_detector([(64, 16)])
        rng = np.random.RandomState(4)
        img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
        out = det.detect_image(img)
        dets = out["merged_for_pr"]
        for r in dets:
            if int(r[8]) != P.STRIKE_CLS:
                assert r[10] == 0.0


class TestMultiImage:
    def test_detect_images_matches_per_image(self):
        det = make_detector([(64, 16)])
        rng = np.random.RandomState(9)
        imgs = [rng.randint(0, 255, (100, 120, 3)).astype(np.uint8),
                rng.randint(0, 255, (90, 100, 3)).astype(np.uint8)]
        batched = det.detect_images(imgs)
        for img, res in zip(imgs, batched):
            single = det.detect_image(img)
            np.testing.assert_allclose(
                res["merged_for_pr"], single["merged_for_pr"],
                rtol=1e-6, atol=1e-6)


class TestDetectStream:
    def test_stream_matches_detect_images(self):
        """The pipelined generator must yield bit-identical per-image
        results to detect_images (dual-scale, mixed sizes, metrics mode
        so the wide set is compared too)."""
        det = make_detector([(64, 16), (96, 24)], metrics=True)
        rng = np.random.RandomState(13)
        imgs = [rng.randint(0, 255, (100, 120, 3)).astype(np.uint8),
                rng.randint(0, 255, (130, 100, 3)).astype(np.uint8),
                rng.randint(0, 255, (100, 120, 3)).astype(np.uint8)]
        streamed = list(det.detect_stream(imgs))
        assert len(streamed) == len(imgs)
        for img, res in zip(imgs, streamed):
            single = det.detect_image(img)
            for key in ("merged_for_pr", "merged_for_map"):
                np.testing.assert_allclose(res[key], single[key],
                                           rtol=1e-6, atol=1e-6)

    def test_stream_empty_and_single(self):
        det = make_detector([(64, 16)])
        assert list(det.detect_stream([])) == []
        rng = np.random.RandomState(14)
        img = rng.randint(0, 255, (80, 80, 3)).astype(np.uint8)
        out = list(det.detect_stream([img]))
        assert len(out) == 1 and out[0]["merged_for_pr"].shape[1] == 11


class TestPackedParams:
    def test_numpy_params_match_device_params(self):
        """Checkpoint-style numpy param trees go through the packed
        single-buffer transfer + in-graph unpack; results must equal the
        device-tree path bit-for-bit."""
        import dataclasses

        cfg = DetectConfig(scales=(ScaleConfig(64, 16, model_scale="n"),),
                           channels=3)
        m = YOLO11OBB(nc=cfg.nc, scale="n", in_channels=3)
        x = np.zeros((1, 64, 64, 3), np.float32)
        v_dev = m.init(jax.random.PRNGKey(7), x)
        v_np = jax.tree.map(lambda a: np.asarray(a), v_dev)

        det_dev = P.TiledDetector(cfg, {64: v_dev}, max_det=16,
                                  pre_topk=32)
        det_np = P.TiledDetector(cfg, {64: v_np}, max_det=16, pre_topk=32)
        assert det_np._packed[64] is not None       # packed path taken
        assert det_dev._packed[64] is None

        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (100, 120, 3)).astype(np.uint8)
        a = det_dev.detect_image(img)["merged_for_pr"]
        b = det_np.detect_image(img)["merged_for_pr"]
        np.testing.assert_array_equal(a, b)


class TestSmallImages:
    def test_image_smaller_than_tile(self):
        """An input smaller than the tile size is one partial tile
        (reference semantics: min(y+ts, H) crop); must not crash and
        coordinates must stay inside the image."""
        det = make_detector([(64, 16)])
        rng = np.random.RandomState(4)
        img = rng.randint(0, 255, (40, 52, 3)).astype(np.uint8)
        out = det.detect_image(img)
        dets = out["merged_for_pr"]
        assert dets.shape[1] == 11
        if len(dets):
            assert (dets[:, 0:8:2] <= 64).all()
            assert (dets[:, 1:8:2] <= 64).all()

    def test_mixed_sizes_batch(self):
        det = make_detector([(64, 16)])
        rng = np.random.RandomState(5)
        imgs = [rng.randint(0, 255, (40, 52, 3)).astype(np.uint8),
                rng.randint(0, 255, (100, 120, 3)).astype(np.uint8)]
        res = det.detect_images(imgs)
        assert len(res) == 2
        for r in res:
            assert r["merged_for_pr"].shape[1] == 11


class TestResultsAPI:
    """The ultralytics-Results migration surface (`Detect_OBB.py:228-231`):
    Detections accessors + TiledDetector.predict/predict_crop."""

    def test_detections_accessors_match_rows(self):
        rows = np.array([
            [0, 0, 10, 0, 10, 8, 0, 8, 1, 0.9, 45.0],
            [5, 5, 9, 5, 9, 9, 5, 9, 3, 0.4, 0.0],
        ], np.float64)
        d = P.Detections(rows)
        assert len(d) == 2
        np.testing.assert_array_equal(d.xyxyxyxy,
                                      rows[:, :8].reshape(-1, 4, 2))
        np.testing.assert_array_equal(d.cls, [1, 3])
        np.testing.assert_allclose(d.conf, [0.9, 0.4])
        np.testing.assert_allclose(d.angle, [45.0, 0.0])
        assert d.names[1] == "Strike"
        # per-detection iteration
        singles = list(d)
        assert len(singles) == 2 and singles[0].cls[0] == 1

    def test_predict_wraps_merged_for_pr(self):
        det = make_detector([(64, 16)])
        rng = np.random.RandomState(3)
        img = rng.randint(0, 255, (100, 120, 3)).astype(np.uint8)
        res = det.detect_image(img)
        d = det.predict(img)
        assert isinstance(d, P.Detections)
        np.testing.assert_allclose(
            d.rows, np.asarray(res["merged_for_pr"])[:, :11])

    def test_predict_crop_matches_manual_mirror(self):
        """predict_crop == letterbox -> forward -> decode -> NMS ->
        (corners - pad) / ratio, checked against a manual mirror of that
        chain on a non-square crop (exercises the coordinate back-map;
        random-init DFL boxes extend far outside the crop, so extent
        bounds are not an invariant — the mapping is)."""
        import dataclasses

        import jax.numpy as jnp

        from oriented_object_detection_tpu.models import decode as D
        from oriented_object_detection_tpu.ops import image as IM

        det = make_detector([(64, 16)])
        det.cfg = dataclasses.replace(det.cfg, conf_thr_predict=0.0)
        det._conf_cache = {}
        rng = np.random.RandomState(4)
        crop = rng.randint(0, 255, (40, 90, 3)).astype(np.uint8)  # wide
        d = det.predict_crop(crop)
        assert isinstance(d, P.Detections)
        assert len(d) > 0          # thr 0.0 keeps NMS survivors

        # manual mirror
        x, ratio, (dw, dh) = IM.letterbox(
            jnp.asarray(crop[..., ::-1].astype(np.float32)), 64)
        out = det.models[64].apply(
            det.params[64], (x[None] / 255.0).astype(jnp.bfloat16))
        rbox, scores = D.decode_raw(out, 64)
        dets = D.postprocess_batch(rbox, scores, jnp.float32(0.0),
                                   det.cfg.engine_nms_iou,
                                   max_det=det.max_det,
                                   pre_topk=det.pre_topk)
        c8 = np.asarray(dets["corners8"][0], np.float64)
        valid = np.asarray(dets["valid"][0], bool)
        want = (c8[valid] - np.array([dw, dh] * 4)) / ratio
        np.testing.assert_allclose(
            d.rows[:, :8], want, atol=1e-3)

    def test_predict_crop_unknown_scale_errors(self):
        det = make_detector([(64, 16)])
        with pytest.raises(ValueError):
            det.predict_crop(np.zeros((32, 32, 3), np.uint8),
                             tile_size=128)


class TestValidPrefixFetch:
    """Adaptive valid-prefix D2H (`TiledDetector._finish_valid_prefix`):
    metrics-mode packs are ~90% invalid padding and dataset-scale fetch
    was D2H-volume-bound, so detect_images fetches only a bucketed
    valid-first prefix when the pack is large. Must be bit-identical to
    the single full fetch in every mode, across repeated chunks (hint
    steady state) and under a saturated predict-mode cap."""

    def _results(self, det, imgs):
        out = []
        for r in det.detect_images(imgs):
            out.append({k: np.asarray(v) for k, v in r.items()
                        if isinstance(v, np.ndarray)})
        return out

    @pytest.mark.parametrize("metrics", [True, False])
    def test_prefix_matches_full_fetch(self, metrics, monkeypatch):
        det = make_detector([(64, 16), (96, 24)], metrics=metrics)
        rng = np.random.RandomState(21)
        imgs = [rng.randint(0, 255, (100, 120, 3)).astype(np.uint8),
                rng.randint(0, 255, (130, 100, 3)).astype(np.uint8)]
        full = self._results(det, imgs)
        monkeypatch.setattr(type(det), "SPLIT_FETCH_MIN_BYTES", 0)
        for _ in range(3):  # repeat: hints move toward the valid count
            pref = self._results(det, imgs)
            assert len(pref) == len(full)
            for a, b in zip(pref, full):
                assert a.keys() == b.keys()
                for k in a:
                    np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    def test_prefix_saturated_fetches_everything(self, monkeypatch):
        """Force a tiny first prefix on a pack with many valid rows: the
        doubling loop must keep fetching until it sees an invalid row (or
        exhausts the pack), never dropping valid rows."""
        det = make_detector([(64, 16)], metrics=True)
        rng = np.random.RandomState(22)
        imgs = [rng.randint(0, 255, (100, 120, 3)).astype(np.uint8)]
        full = self._results(det, imgs)
        monkeypatch.setattr(type(det), "SPLIT_FETCH_MIN_BYTES", 0)
        self._results(det, imgs)          # learn the (ts, K) hint keys
        assert det._fetch_hints, "prefix path did not engage"
        # a tiny hint forces the smallest bucket; every row of it will be
        # valid -> the doubling loop must walk up to the first invalid row
        det._fetch_hints = {k: -63 for k in det._fetch_hints}
        pref = self._results(det, imgs)
        for a, b in zip(pref, full):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    def test_chunked_stream_matches_detect_images(self, monkeypatch):
        """detect_stream(chunk>1) pipelines uploads under compute; its
        per-image results must be identical to detect_images — in both
        fetch regimes (small joined fetch and forced prefix fetch)."""
        det = make_detector([(64, 16), (96, 24)], metrics=True)
        rng = np.random.RandomState(23)
        imgs = [rng.randint(0, 255, (100, 120, 3)).astype(np.uint8)
                for _ in range(5)]
        full = self._results(det, imgs)
        for thr in (None, 0):
            if thr is not None:
                monkeypatch.setattr(type(det), "SPLIT_FETCH_MIN_BYTES",
                                    thr)
            streamed = []
            for r in det.detect_stream(imgs, chunk=2):
                streamed.append({k: np.asarray(v) for k, v in r.items()
                                 if isinstance(v, np.ndarray)})
            assert len(streamed) == len(full)
            for a, b in zip(streamed, full):
                for k in a:
                    np.testing.assert_array_equal(a[k], b[k], err_msg=k)


class TestConstructorGuards:
    def test_nc_over_meta_capacity_refused(self):
        """cls packs into 4 bits of the meta column (stride 32): nc > 16
        would silently corrupt cls AND tile_id in _unpack_rows, so the
        constructor must refuse loudly."""
        import dataclasses
        cfg = DetectConfig(scales=(ScaleConfig(64, 16, model_scale="n"),),
                           channels=3)
        cfg = dataclasses.replace(cfg, nc=20)
        with pytest.raises(ValueError, match="meta column"):
            P.TiledDetector(cfg, {}, max_det=16, pre_topk=32)

    def test_caller_params_dict_not_mutated_by_fold(self):
        """BN folding must operate on a copy: mutating the caller's dict
        would hand neutralized-BN trees to training warm-starts or to a
        second detector (double-fold)."""
        cfg = DetectConfig(scales=(ScaleConfig(64, 16, model_scale="n"),),
                           channels=3, compute_dtype="float32")
        m = YOLO11OBB(nc=cfg.nc, scale="n", in_channels=3)
        x = np.zeros((1, 64, 64, 3), np.float32)
        v = jax.tree.map(np.asarray, m.init(jax.random.PRNGKey(0), x))
        caller = {64: v}
        det = P.TiledDetector(cfg, caller, max_det=16, pre_topk=32)
        assert det._folded[64], "numpy tree should have been folded"
        assert caller[64] is v, "caller's dict entry was replaced"
        # and a second detector from the SAME dict folds fresh (no
        # double-fold of an already-folded tree)
        det2 = P.TiledDetector(cfg, caller, max_det=16, pre_topk=32)
        a = jax.tree.leaves(det.params[64])
        b = jax.tree.leaves(det2.params[64])
        for la, lb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
