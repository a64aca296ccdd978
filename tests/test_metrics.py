"""Metrics suite tests vs literal-mirror oracles of the reference
evaluators (cv2-based IoU instead of shapely)."""

import numpy as np
import pytest

import jax.numpy as jnp

from oriented_object_detection_tpu.eval import metrics as M
from oriented_object_detection_tpu.ops import geometry as G

cv2 = pytest.importorskip("cv2")


def oracle_iou(b1, b2):
    pa = np.asarray(b1, np.float64).reshape(4, 2).astype(np.float32)
    pb = np.asarray(b2, np.float64).reshape(4, 2).astype(np.float32)
    inter, _ = cv2.intersectConvexConvex(pa, pb)
    area = lambda p: abs(cv2.contourArea(p))
    u = area(pa) + area(pb) - inter
    return inter / u if u > 0 else 0.0


def rect(cx, cy, w, h, th=0.0):
    return np.asarray(G.xywhr_to_corners8(
        jnp.array([cx, cy, w, h, th], jnp.float64)))


def det(cx, cy, w, h, cls, conf, th=0.0):
    return np.concatenate([rect(cx, cy, w, h, th), [cls, conf, 0.0]])


def gt(cx, cy, w, h, cls, th=0.0):
    return np.concatenate([[cls], rect(cx, cy, w, h, th)])


class MemoryCache(M.GTCache):
    def __init__(self, gt_map):
        super().__init__(loader=lambda p: gt_map.get(
            p, np.zeros((0, 9))))


class TestAP:
    def test_hand_computed(self):
        # 3 dets sorted by conf: TP, FP, TP; npos = 2
        recall = np.array([0.5, 0.5, 1.0])
        precision = np.array([1.0, 0.5, 2 / 3])
        ap = M.compute_ap_from_pr(recall, precision)
        # envelope: at recall .5 -> 1.0; at recall 1.0 -> 2/3
        assert ap == pytest.approx(0.5 * 1.0 + 0.5 * (2 / 3))

    def test_perfect(self):
        ap = M.compute_ap_from_pr(np.array([1.0]), np.array([1.0]))
        assert ap == pytest.approx(1.0)


class TestMatching:
    def test_greedy_order(self):
        # det order matters: first det takes best gt
        d1 = det(10, 10, 6, 6, 0, 0.9)
        d2 = det(11, 10, 6, 6, 0, 0.5)
        g1 = gt(10, 10, 6, 6, 0)
        dets = np.stack([d1, d2])
        gts = np.stack([g1])
        iou = np.array([[oracle_iou(d1[:8], g1[1:])],
                        [oracle_iou(d2[:8], g1[1:])]])
        tp, fp, fn = M.match_dets_to_gts(dets, gts, iou, 0.5)
        assert (tp, fp, fn) == (1, 1, 0)

    def test_class_mismatch(self):
        d = det(10, 10, 6, 6, 1, 0.9)
        g = gt(10, 10, 6, 6, 0)
        iou = np.array([[1.0]])
        tp, fp, fn = M.match_dets_to_gts(
            np.stack([d]), np.stack([g]), iou, 0.5)
        assert (tp, fp, fn) == (0, 1, 1)


class TestEvaluateMap:
    def test_perfect_detections(self):
        gts = {"img1": np.stack([gt(20, 20, 10, 8, 0),
                                 gt(60, 60, 12, 6, 1, 0.4)])}
        dets = {"img1": np.stack([det(20, 20, 10, 8, 0, 0.9),
                                  det(60, 60, 12, 6, 1, 0.8, 0.4)])}
        cache = MemoryCache(gts)
        out = M.evaluate_map(dets, ["img1"], [0.5], cache)
        assert out["mAP@0.5"] == pytest.approx(1.0)

    def test_half_missed(self):
        gts = {"img1": np.stack([gt(20, 20, 10, 8, 0),
                                 gt(60, 60, 10, 8, 0)])}
        dets = {"img1": np.stack([det(20, 20, 10, 8, 0, 0.9)])}
        cache = MemoryCache(gts)
        out = M.evaluate_map(dets, ["img1"], [0.5], cache)
        # AP: recall 0.5, precision 1 -> 0.5
        assert out["mAP@0.5"] == pytest.approx(0.5)

    def test_localization_threshold_sweep(self):
        # det offset so IoU ~ 0.6: counts at 0.5, not at 0.7
        g0 = gt(20, 20, 10, 10, 0)
        d0 = det(22.5, 20, 10, 10, 0, 0.9)
        iou = oracle_iou(d0[:8], g0[1:])
        assert 0.5 < iou < 0.7
        cache = MemoryCache({"i": np.stack([g0])})
        dets = {"i": np.stack([d0])}
        lo = M.evaluate_map(dets, ["i"], [0.5], cache)
        hi = M.evaluate_map(dets, ["i"], [0.7], cache)
        assert lo["per_iou"][0.5] == pytest.approx(1.0)
        assert hi["per_iou"][0.7] == pytest.approx(0.0)

    def test_map_min_score_filter(self):
        g0 = gt(20, 20, 10, 10, 0)
        d0 = det(20, 20, 10, 10, 0, 0.0005)  # below MAP_MIN_SCORE
        cache = MemoryCache({"i": np.stack([g0])})
        out = M.evaluate_map({"i": np.stack([d0])}, ["i"], [0.5], cache)
        assert out["mAP@0.5"] == pytest.approx(0.0)


class TestCenterHit:
    def test_basic(self):
        gts = {"i": np.stack([gt(20, 20, 10, 10, 0)])}
        dets = {"i": np.stack([
            det(20, 20, 4, 4, 0, 0.9),    # center inside -> TP
            det(50, 50, 4, 4, 0, 0.9),    # outside -> FP
        ])}
        cache = MemoryCache(gts)
        P, R, F1 = M.evaluate_center_hit(dets, ["i"], cache, conf_thr=0.5)
        assert P == pytest.approx(0.5, abs=1e-6)
        assert R == pytest.approx(1.0, abs=1e-6)

    def test_conf_filter(self):
        gts = {"i": np.stack([gt(20, 20, 10, 10, 0)])}
        dets = {"i": np.stack([det(20, 20, 4, 4, 0, 0.3)])}
        cache = MemoryCache(gts)
        P, R, _ = M.evaluate_center_hit(dets, ["i"], cache, conf_thr=0.5)
        assert R == pytest.approx(0.0, abs=1e-6)  # det filtered -> FN


class TestDatasetEval:
    def test_counts(self):
        gts = {"a": np.stack([gt(20, 20, 10, 10, 0)]),
               "b": np.stack([gt(30, 30, 10, 10, 1)])}
        dets = {"a": np.stack([det(20, 20, 10, 10, 0, 0.9)]),
                "b": np.stack([det(70, 70, 10, 10, 1, 0.9)])}
        cache = MemoryCache(gts)
        P, R, F1 = M.evaluate_dataset(dets, ["a", "b"], cache,
                                      conf_thr=0.25, iou_thr=0.5)
        assert P == pytest.approx(0.5, abs=1e-6)
        assert R == pytest.approx(0.5, abs=1e-6)

    def test_classwise_report(self, tmp_path):
        gts = {"a": np.stack([gt(20, 20, 10, 10, 0),
                              gt(50, 50, 10, 10, 1)])}
        dets = {"a": np.stack([det(20, 20, 10, 10, 0, 0.9),
                               det(50, 50, 10, 10, 1, 0.9)])}
        cache = MemoryCache(gts)
        out = str(tmp_path / "cw.xlsx")
        rows = M.classwise_report(dets, ["a"], cache, 0.25, 0.5,
                                  out_path=out)
        assert len(rows) == 2
        assert all(r[2] == 1 and r[3] == 0 for r in rows)  # TP=1 FP=0
        from oriented_object_detection_tpu.utils import xlsx
        parsed = xlsx.read_xlsx(out)
        assert parsed[0][0] == "cls_id"


class TestFullEval:
    def test_run_fusion_eval_end_to_end(self, tmp_path):
        # build a real input dir: image + label file
        img = np.full((100, 100, 3), 255, np.uint8)
        ip = str(tmp_path / "map1.png")
        cv2.imwrite(ip, img)
        g0 = gt(20, 20, 10, 10, 0)
        with open(tmp_path / "map1.txt", "w") as f:
            vals = g0[1:] / 100.0
            f.write("0 " + " ".join(f"{v:.6f}" for v in vals) + "\n")
        dets = {ip: np.stack([det(20, 20, 10, 10, 0, 0.9)])}
        res = M.run_fusion_eval(dets, str(tmp_path), str(tmp_path),
                                iou_thr=0.25, single_scale=True)
        assert res["precision"] == pytest.approx(1.0, abs=1e-6)
        assert res["mAP@0.5"] == pytest.approx(1.0, abs=1e-6)
        assert (tmp_path / "fusion_classwise_metrics.xlsx").exists()


class TestMultiThresholdPR:
    @staticmethod
    def _scalar_mirror(dets, gts, iou_lookup, iou_thr):
        """Literal mirror of the single-threshold greedy PR walk
        (`Detect_OBB.py:512-565`) as an independent oracle — the
        production scalar path now delegates to the multi-threshold
        walk, so this pin must not."""
        from oriented_object_detection_tpu.eval.metrics import (
            compute_ap_from_pr)

        npos = sum(len(v) for v in gts.values())
        if npos == 0:
            return np.array([0.0]), np.array([0.0]), 0.0, 0, 0, 0
        if not dets:
            return np.array([0.0]), np.array([0.0]), 0.0, 0, 0, npos
        order = sorted(range(len(dets)), key=lambda i: -dets[i][2])
        tp = np.zeros(len(dets))
        fp = np.zeros(len(dets))
        matched = {im: np.zeros(len(v), bool) for im, v in gts.items()}
        for rank, di in enumerate(order):
            im, det_idx, _ = dets[di]
            rows = np.asarray(gts.get(im, []), int)
            best_iou, best_j = 0.0, -1
            if len(rows):
                cand = np.where(matched[im], 0.0,
                                iou_lookup(im)[det_idx, rows])
                j = int(np.argmax(cand))
                if cand[j] > 0.0:
                    best_iou, best_j = float(cand[j]), j
            if best_iou >= iou_thr and best_j >= 0:
                tp[rank] = 1
                matched[im][best_j] = True
            else:
                fp[rank] = 1
        tp_c, fp_c = np.cumsum(tp), np.cumsum(fp)
        recall = tp_c / (npos + 1e-9)
        precision = tp_c / (tp_c + fp_c + 1e-9)
        ap = compute_ap_from_pr(recall, precision)
        return (precision, recall, ap, int(tp_c[-1]), int(fp_c[-1]),
                npos - int(tp_c[-1]))

    def test_multi_equals_scalar_per_threshold(self):
        """compute_pr_for_class_multi (and the delegating
        compute_pr_for_class) must equal T independent scalar-mirror
        runs exactly (same greedy state evolution per threshold)."""
        from oriented_object_detection_tpu.eval.metrics import (
            compute_pr_for_class, compute_pr_for_class_multi)

        rng = np.random.RandomState(0)
        imgs = [f"im{k}" for k in range(6)]
        gts = {im: list(range(rng.randint(0, 7))) for im in imgs}
        ious = {im: rng.rand(12, max(len(g), 1)) * 0.9
                for im, g in gts.items()}
        dets = []
        for im in imgs:
            for d in range(rng.randint(0, 12)):
                dets.append((im, d, float(rng.rand())))
        # duplicate scores exercise the sort tie order
        if len(dets) > 3:
            dets[1] = (dets[1][0], dets[1][1], dets[0][2])

        def lookup(im):
            return ious[im]

        iou_list = [0.1, 0.25, 0.5, 0.75, 0.9]
        multi = compute_pr_for_class_multi(dets, gts, lookup, iou_list)
        for t, thr in enumerate(iou_list):
            oracle = self._scalar_mirror(dets, gts, lookup, thr)
            single = compute_pr_for_class(dets, gts, lookup, thr)
            for got in (multi[t], single):
                np.testing.assert_allclose(got[0], oracle[0])  # prec
                np.testing.assert_allclose(got[1], oracle[1])  # rec
                assert got[2] == oracle[2]                     # ap
                assert got[3:] == oracle[3:]                   # TP/FP/FN

    def test_multi_empty_edges(self):
        from oriented_object_detection_tpu.eval.metrics import (
            compute_pr_for_class_multi)

        out = compute_pr_for_class_multi([], {"a": [0, 1]}, None,
                                         [0.5, 0.7])
        assert out[0][5] == 2 and out[1][5] == 2  # FN = npos
        # npos == 0 short-circuits to the zero result, exactly like the
        # scalar path (`Detect_OBB.py:512-517` returns before scanning)
        from oriented_object_detection_tpu.eval.metrics import (
            compute_pr_for_class)

        multi = compute_pr_for_class_multi(
            [("a", 0, 0.9)], {"a": []}, lambda im: np.zeros((1, 0)),
            [0.5])
        single = compute_pr_for_class(
            [("a", 0, 0.9)], {"a": []}, lambda im: np.zeros((1, 0)), 0.5)
        assert multi[0][2:] == single[2:]


class TestNativePRMatcher:
    def test_native_path_equals_python_fallback(self, monkeypatch):
        """The per-image native C++ matcher (scattered into global rank
        order) must equal the Python per-detection walk bit-for-bit."""
        from oriented_object_detection_tpu.eval.metrics import (
            compute_pr_for_class_multi)
        from oriented_object_detection_tpu.utils import native as NAT

        if not NAT.available():
            pytest.skip("native lib unavailable")
        rng = np.random.RandomState(5)
        iou_list = [0.3, 0.5, 0.7, 0.9]
        for _ in range(10):
            imgs = [f"im{k}" for k in range(5)]
            gts = {im: list(range(rng.randint(0, 8))) for im in imgs}
            mats = {im: np.round(rng.rand(12, 16), 2) for im in imgs}
            # zero some rows/cols to hit the no-candidate branches
            for im in imgs:
                mats[im][rng.rand(12) < 0.3] = 0.0
            dets = [(im, rng.randint(0, 12),
                     float(np.round(rng.rand(), 2)))
                    for im in imgs for _ in range(rng.randint(0, 9))]
            lookup = mats.__getitem__
            got = compute_pr_for_class_multi(dets, gts, lookup, iou_list)
            monkeypatch.setattr(NAT, "available", lambda: False)
            want = compute_pr_for_class_multi(dets, gts, lookup, iou_list)
            monkeypatch.undo()
            assert len(got) == len(want)
            for g, w in zip(got, want):
                np.testing.assert_array_equal(g[0], w[0])
                np.testing.assert_array_equal(g[1], w[1])
                assert g[2:] == w[2:]


class TestGTCacheKeying:
    """VERDICT r03 #8: the IoU memo must key on det CONTENT (bytes), not a
    64-bit Python hash that can collide, and it must be bounded."""

    def _cache(self):
        g = gt(10, 10, 6, 6, 0)
        return MemoryCache({"img": np.stack([g])})

    def test_distinct_dets_distinct_entries(self):
        c = self._cache()
        d1 = np.stack([det(10, 10, 6, 6, 0, 0.9)])
        d2 = np.stack([det(40, 40, 6, 6, 0, 0.9)])  # no overlap with gt
        m1 = c.iou(d1, "img")
        m2 = c.iou(d2, "img")
        assert len(c._iou) == 2
        assert m1[0, 0] > 0.9 and m2[0, 0] == 0.0

    def test_content_keyed_memo_hit(self):
        c = self._cache()
        d = np.stack([det(10, 10, 6, 6, 0, 0.9)])
        m1 = c.iou(d, "img")
        m2 = c.iou(d.copy(), "img")   # distinct array object, same bytes
        assert m1 is m2 and len(c._iou) == 1

    def test_lru_bound(self):
        c = self._cache()
        c.IOU_CACHE_MAX = 4
        for k in range(10):
            c.iou(np.stack([det(10 + k, 10, 6, 6, 0, 0.9)]), "img")
        assert len(c._iou) == 4
