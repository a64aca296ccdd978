"""Off-size val tiles go through engine letterbox semantics, not
aspect-distorting resize (VERDICT r04 #9).

The engine letterboxes every val image (aspect-preserving resize +
114 center pad); built val tiles are ts-sized so the path only fires on
partial-edge or foreign tiles — but when it fires the GT must map
through the SAME (r, dw, dh) transform as the image.
"""

import jax
import numpy as np

import oriented_object_detection_tpu.eval.val as V
from oriented_object_detection_tpu.config import TrainConfig
from oriented_object_detection_tpu.eval.val import _letterbox_np
from oriented_object_detection_tpu.ops import image as I


class TestLetterboxNp:
    def test_matches_device_letterbox(self):
        rng = np.random.RandomState(0)
        for h, w in [(40, 64), (64, 40), (30, 30), (64, 64)]:
            img = rng.randint(0, 255, (h, w, 3), np.uint8)
            out_np, r_np, (dw_np, dh_np) = _letterbox_np(img, 64)
            out_j, r_j, (dw_j, dh_j) = I.letterbox(
                jax.numpy.asarray(img), 64)
            assert out_np.shape == (64, 64, 3)
            assert np.isclose(r_np, r_j)
            assert (dw_np, dh_np) == (dw_j, dh_j)
            # pad region is exactly 114; content region interpolation
            # may differ slightly (cv2 vs jax.image) but stays close
            assert np.abs(out_np.astype(np.float32)
                          - np.asarray(out_j)).max() <= 2.0

    def test_point_mapping(self):
        # a white 2x2 marker at (x0, y0) in a partial tile must land at
        # (x0*r + dw, y0*r + dh) in the letterboxed frame
        img = np.zeros((40, 64, 3), np.uint8)
        x0, y0 = 32, 20
        img[y0 - 1:y0 + 1, x0 - 1:x0 + 1] = 255
        out, r, (dw, dh) = _letterbox_np(img, 64)
        xm, ym = int(round(x0 * r + dw)), int(round(y0 * r + dh))
        assert out[ym - 1, xm - 1].max() > 100
        # pad rows (top/bottom for a wide tile) are pure 114
        assert (out[0] == 114).all() and (out[-1] == 114).all()


class _StubDS:
    """Two tiles: one ts-sized, one partial (40 x ts)."""

    def __init__(self, ts):
        rng = np.random.RandomState(3)
        self.ts = ts
        self.paths = ["full.jpg", "partial.jpg"]
        self._imgs = [rng.randint(0, 255, (ts, ts, 3), np.uint8),
                      rng.randint(0, 255, (40, ts, 3), np.uint8)]
        # one normalized GT box per tile (cls, x1..y4 in [0,1] of the
        # tile's OWN size)
        self._labs = [
            np.array([[1, .2, .2, .6, .2, .6, .6, .2, .6]], np.float64),
            np.array([[2, .25, .25, .75, .25, .75, .75, .25, .75]],
                     np.float64),
        ]

    def __len__(self):
        return 2

    def get(self, i):
        return self._imgs[i], self._labs[i]


class TestValPartialTile:
    def test_gt_mapped_through_letterbox(self, monkeypatch):
        from oriented_object_detection_tpu.train import trainer as TR

        ts = 64
        cfg = TrainConfig(tile_size=ts, model_scale="n", channels=3,
                          compute_dtype="float32")
        model, state, _ = TR.create_train_state(
            cfg, jax.random.PRNGKey(0), steps_per_epoch=1)

        captured = {}
        real_eval = V.M.evaluate_map

        def spy(dets, imgs, ious, cache):
            captured["gt"] = {p: cache.gt(p) for p in imgs}
            return real_eval(dets, imgs, ious, cache)

        monkeypatch.setattr(V.M, "evaluate_map", spy)
        fitness = V.validate_tiles(model, state, _StubDS(ts), cfg,
                                   batch_size=2)
        assert np.isfinite(fitness)

        # full tile: plain * ts denormalization
        gt_full = captured["gt"]["full.jpg"]
        assert np.allclose(gt_full[0, 1:],
                           np.array([.2, .2, .6, .2, .6, .6, .2, .6]) * ts)

        # partial 40x64 tile: r = 1.0, dw = 0, dh = (64-40)/2 -> top=12
        gt_part = captured["gt"]["partial.jpg"]
        r, dw, dh = 1.0, 0.0, 12.0
        xs = np.array([.25, .75, .75, .25]) * 64 * r + dw
        ys = np.array([.25, .25, .75, .75]) * 40 * r + dh
        assert np.allclose(gt_part[0, 1:9:2], xs)
        assert np.allclose(gt_part[0, 2:9:2], ys)
