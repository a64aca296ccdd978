"""NMS + consensus-fusion tests against a pure-Python oracle that mirrors
the reference algorithms (`Detect_OBB.py:176-200`, `:347-423`) using
cv2-based exact IoU."""

import numpy as np
import pytest

import jax.numpy as jnp

from oriented_object_detection_tpu.ops import geometry as G
from oriented_object_detection_tpu.ops import nms as N
from oriented_object_detection_tpu.infer import fusion as F

cv2 = pytest.importorskip("cv2")


def oracle_iou(b1, b2):
    pa = np.asarray(b1, np.float64).reshape(4, 2).astype(np.float32)
    pb = np.asarray(b2, np.float64).reshape(4, 2).astype(np.float32)
    inter, _ = cv2.intersectConvexConvex(pa, pb)
    area = lambda p: abs(cv2.contourArea(p))
    u = area(pa) + area(pb) - inter
    return inter / u if u > 0 else 0.0


def oracle_merge(dets, iou_threshold):
    """Line-for-line mirror of reference merge_detections semantics."""
    dets = [tuple(d) for d in dets]
    dets.sort(key=lambda x: x[9], reverse=True)
    merged = []
    for det1 in dets:
        box1, cls1 = det1[:8], det1[8]
        keep = True
        for det2 in merged:
            box2, cls2 = det2[:8], det2[8]
            if cls1 == cls2 and oracle_iou(box1, box2) >= iou_threshold:
                keep = False
                break
        if keep:
            merged.append(det1)
    return np.array(merged).reshape(-1, 11)


def oracle_consensus(dets_by_scale):
    """Mirror of reference cross_scale_consensus_filter semantics."""
    P, LO, HI = 0.40, 0.25, 0.70
    scales = sorted(dets_by_scale.keys())
    if len(scales) == 1:
        return np.asarray(dets_by_scale[scales[0]]).reshape(-1, 11)
    f = {s: [d for d in dets_by_scale[s] if d[9] >= LO] for s in scales}
    visited = {s: [False] * len(f[s]) for s in scales}
    flat = [(s, i, d) for s in scales for i, d in enumerate(f[s])]
    others = {s: [t for t in scales if t != s] for s in scales}
    kept = []
    for s, i, d in flat:
        if visited[s][i]:
            continue
        cls_d, conf_d = int(d[8]), float(d[9])
        best = None
        bconf, biou = -1.0, 0.0
        for t in others[s]:
            for j, p in enumerate(f[t]):
                if visited[t][j] or int(p[8]) != cls_d:
                    continue
                iou = oracle_iou(d[:8], p[:8])
                if iou >= P:
                    cp = float(p[9])
                    if cp > bconf or (cp == bconf and iou > biou):
                        best, bconf, biou = (t, j), cp, iou
        if best is None or bconf < LO:
            if conf_d >= HI:
                kept.append(d)
            visited[s][i] = True
            continue
        t, j = best
        kept.append(d if conf_d >= bconf else f[t][j])
        visited[s][i] = True
        visited[t][j] = True
    return np.array(kept).reshape(-1, 11)


def random_dets(rng, n, ncls=4, span=200.0):
    boxes = np.stack([
        np.array([rng.uniform(20, span - 20), rng.uniform(20, span - 20),
                  rng.uniform(5, 30), rng.uniform(5, 30),
                  rng.uniform(-np.pi, np.pi)]) for _ in range(n)
    ])
    c8 = np.asarray(G.xywhr_to_corners8(jnp.asarray(boxes)))
    cls = rng.randint(0, ncls, n).astype(np.float64)
    conf = rng.uniform(0.01, 1.0, n)
    ang = np.zeros(n)
    return np.concatenate(
        [c8, cls[:, None], conf[:, None], ang[:, None]], axis=1)


def clustered_dets(rng, n_clusters, per_cluster, ncls=3, span=200.0):
    """Overlapping clusters — exercises suppression chains."""
    rows = []
    for _ in range(n_clusters):
        cx, cy = rng.uniform(30, span - 30, 2)
        w, h = rng.uniform(10, 25, 2)
        th = rng.uniform(-np.pi, np.pi)
        cls = rng.randint(0, ncls)
        for _ in range(per_cluster):
            b = np.array([cx + rng.normal(0, 3), cy + rng.normal(0, 3),
                          w * rng.uniform(0.8, 1.2), h * rng.uniform(0.8, 1.2),
                          th + rng.normal(0, 0.1)])
            c8 = np.asarray(G.xywhr_to_corners8(jnp.asarray(b)))
            rows.append(np.concatenate(
                [c8, [cls, rng.uniform(0.01, 1.0), 0.0]]))
    return np.stack(rows)


class TestNMSKernel:
    def test_matches_oracle_random(self):
        rng = np.random.RandomState(0)
        for trial in range(5):
            dets = clustered_dets(rng, 6, 5)
            n = len(dets)
            keep = np.asarray(N.nms_keep_mask(
                jnp.asarray(dets[:, :8]), jnp.asarray(dets[:, 8], jnp.int32),
                jnp.asarray(dets[:, 9]), jnp.ones(n, bool), 0.4))
            got = dets[keep]
            got = got[np.argsort(-got[:, 9], kind="stable")]
            ref = oracle_merge(dets, 0.4)
            assert got.shape == ref.shape, trial
            np.testing.assert_allclose(got, ref, atol=1e-9)

    def test_padding_invalid_ignored(self):
        rng = np.random.RandomState(1)
        dets = clustered_dets(rng, 3, 4)
        n = len(dets)
        pad = 8
        c8 = np.concatenate([dets[:, :8], np.zeros((pad, 8))])
        cls = np.concatenate([dets[:, 8], np.zeros(pad)])
        conf = np.concatenate([dets[:, 9], np.full(pad, 2.0)])  # high conf!
        valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        keep = np.asarray(N.nms_keep_mask(
            jnp.asarray(c8), jnp.asarray(cls, jnp.int32), jnp.asarray(conf),
            jnp.asarray(valid), 0.4))
        assert not keep[n:].any()
        keep_ref = np.asarray(N.nms_keep_mask(
            jnp.asarray(dets[:, :8]), jnp.asarray(dets[:, 8], jnp.int32),
            jnp.asarray(dets[:, 9]), jnp.ones(n, bool), 0.4))
        np.testing.assert_array_equal(keep[:n], keep_ref)

    def test_class_awareness(self):
        # identical boxes, different classes -> both kept
        c8 = np.tile(
            np.asarray(G.xywhr_to_corners8(jnp.array([50., 50, 20, 10, 0.3]))),
            (2, 1))
        keep = np.asarray(N.nms_keep_mask(
            jnp.asarray(c8), jnp.array([0, 1]), jnp.array([0.9, 0.8]),
            jnp.ones(2, bool), 0.4))
        assert keep.all()

    def test_probiou_mode_runs(self):
        rng = np.random.RandomState(2)
        dets = clustered_dets(rng, 4, 4)
        keep = np.asarray(N.nms_keep_mask(
            jnp.asarray(dets[:, :8]), jnp.asarray(dets[:, 8], jnp.int32),
            jnp.asarray(dets[:, 9]), jnp.ones(len(dets), bool), 0.7,
            use_exact=False))
        assert keep.any()


class TestHostMerge:
    def test_matches_oracle(self):
        rng = np.random.RandomState(3)
        for _ in range(5):
            dets = clustered_dets(rng, 5, 4)
            got = F.merge_detections(dets, 0.4)
            ref = oracle_merge(dets, 0.4)
            np.testing.assert_allclose(got, ref, atol=1e-9)

    def test_empty(self):
        out = F.merge_detections(np.zeros((0, 11)), 0.4)
        assert out.shape == (0, 11)


class TestConsensusFusion:
    def test_single_scale_passthrough(self):
        rng = np.random.RandomState(4)
        d = random_dets(rng, 7)
        out = F.cross_scale_consensus_filter({128: d})
        np.testing.assert_allclose(out, d)

    def test_matches_oracle_dual_scale(self):
        rng = np.random.RandomState(5)
        for trial in range(5):
            base = clustered_dets(rng, 6, 3)
            # scale 2 sees jittered versions of some + extras
            jit2 = base.copy()[rng.rand(len(base)) < 0.7]
            jit2[:, :8] += rng.normal(0, 1.5, jit2[:, :8].shape)
            jit2[:, 9] = rng.uniform(0.01, 1.0, len(jit2))
            extra = random_dets(rng, 4)
            d128 = base
            d416 = np.concatenate([jit2, extra])
            got = F.cross_scale_consensus_filter({128: d128, 416: d416})
            ref = oracle_consensus({128: d128, 416: d416})
            assert got.shape == ref.shape, trial
            np.testing.assert_allclose(got, ref, atol=1e-9)

    def test_solo_high_conf_kept(self):
        d = random_dets(np.random.RandomState(6), 1)
        d[0, 9] = 0.9
        out = F.cross_scale_consensus_filter(
            {128: d, 416: np.zeros((0, 11))})
        assert len(out) == 1

    def test_solo_low_conf_dropped(self):
        d = random_dets(np.random.RandomState(7), 1)
        d[0, 9] = 0.5  # above CONS_LOW, below CONS_HIGH, no partner
        out = F.cross_scale_consensus_filter(
            {128: d, 416: np.zeros((0, 11))})
        assert len(out) == 0


class TestOneShotNMS:
    def oracle_oneshot(self, dets, thr):
        """Mirror of ultralytics nms_rotated: sort desc, probiou matrix,
        keep where no higher-ranked same-class box has iou >= thr."""
        from oriented_object_detection_tpu.ops import geometry as G
        order = np.argsort(-dets[:, 9], kind="stable")
        d = dets[order]
        xywhr = np.asarray(G.corners8_to_xywhr(jnp.asarray(d[:, :8])))
        iou = np.asarray(G.probiou_matrix(jnp.asarray(xywhr),
                                          jnp.asarray(xywhr)))
        n = len(d)
        keep_sorted = np.ones(n, bool)
        for i in range(n):
            for j in range(i):
                if d[j, 8] == d[i, 8] and iou[j, i] >= thr:
                    keep_sorted[i] = False
                    break
        keep = np.zeros(n, bool)
        keep[order] = keep_sorted
        return keep

    def test_matches_oracle(self):
        rng = np.random.RandomState(11)
        for _ in range(5):
            dets = clustered_dets(rng, 5, 4)
            got = np.asarray(N.nms_keep_mask_oneshot(
                jnp.asarray(dets[:, :8]),
                jnp.asarray(dets[:, 8], jnp.int32),
                jnp.asarray(dets[:, 9]), jnp.ones(len(dets), bool), 0.7))
            ref = self.oracle_oneshot(dets, 0.7)
            np.testing.assert_array_equal(got, ref)

    def test_differs_from_greedy_on_chains(self):
        """A-B overlap, B-C overlap, A-C don't: greedy keeps A,C;
        one-shot keeps only A (B suppressed by A still suppresses C)."""
        from oriented_object_detection_tpu.ops import geometry as G
        boxes = np.array([[0.0, 0, 10, 4, 0],
                          [4.0, 0, 10, 4, 0],
                          [8.0, 0, 10, 4, 0]])
        c8 = np.asarray(G.xywhr_to_corners8(jnp.asarray(boxes)))
        cls = jnp.zeros(3, jnp.int32)
        conf = jnp.array([0.9, 0.8, 0.7])
        v = jnp.ones(3, bool)
        oneshot = np.asarray(N.nms_keep_mask_oneshot(
            jnp.asarray(c8), cls, conf, v, 0.4))
        greedy = np.asarray(N.nms_keep_mask(
            jnp.asarray(c8), cls, conf, v, 0.4, use_exact=False))
        assert list(oneshot) == [True, False, False]
        assert list(greedy) == [True, False, True]


class TestNativeConsensus:
    """The native C++ consensus_filter is the production path; the Python
    walk is its fallback. Both must agree bit-for-bit (the mirror-oracle
    tests above already pin the production path to the reference)."""

    def _rand_scales(self, rng, n128, n416):
        def mk(n):
            d = np.zeros((n, 11))
            cx = rng.uniform(20, 400, n)
            cy = rng.uniform(20, 400, n)
            w = rng.uniform(6, 30, n)
            h = rng.uniform(6, 30, n)
            th = rng.uniform(0, np.pi, n)
            c, s = np.cos(th), np.sin(th)
            dx = np.stack([w * c - h * s, w * c + h * s,
                           -w * c + h * s, -w * c - h * s], 1) / 2
            dy = np.stack([w * s + h * c, w * s - h * c,
                           -w * s - h * c, -w * s + h * c], 1) / 2
            d[:, 0:8:2] = cx[:, None] + dx
            d[:, 1:8:2] = cy[:, None] + dy
            d[:, 8] = rng.randint(0, 3, n)
            # conf includes sub-CONS_LOW rows and exact ties
            d[:, 9] = np.round(rng.uniform(0.1, 1.0, n), 2)
            return d
        return {128: mk(n128), 416: mk(n416)}

    def test_native_matches_python_fallback(self, monkeypatch):
        from oriented_object_detection_tpu.utils import native as NAT
        if not NAT.available():
            pytest.skip("native lib unavailable")
        rng = np.random.RandomState(77)
        for _ in range(20):
            dbs = self._rand_scales(rng, rng.randint(0, 60),
                                    rng.randint(0, 40))
            got = F.cross_scale_consensus_filter(dbs)
            monkeypatch.setattr(NAT, "consensus_filter",
                                lambda *a, **k: None)
            want = F.cross_scale_consensus_filter(dbs)
            monkeypatch.undo()
            np.testing.assert_array_equal(got, want)

    def test_nms_prescreen_matches_matrix_path(self):
        """AABB-prescreened native greedy NMS == the precomputed-IoU
        Python greedy (merge_detections with an explicit matrix)."""
        from oriented_object_detection_tpu.utils import native as NAT
        if not NAT.available():
            pytest.skip("native lib unavailable")
        rng = np.random.RandomState(78)
        for _ in range(10):
            d = self._rand_scales(rng, 80, 0)[128]
            got = F.merge_detections(d, 0.4)
            iou = F.exact_iou_matrix_host(d[:, :8], d[:, :8])
            want = F.merge_detections(d, 0.4, iou=iou)
            np.testing.assert_array_equal(got, want)
