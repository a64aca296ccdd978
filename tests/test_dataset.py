"""Dataset builder + loader tests on a synthetic GeoMap-like corpus."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from oriented_object_detection_tpu.data import dataset as DS
from oriented_object_detection_tpu.data import labels as L
from oriented_object_detection_tpu.data.loader import TileDataset
from oriented_object_detection_tpu.ops import augment as AUG

cv2 = pytest.importorskip("cv2")


@pytest.fixture
def corpus(tmp_path):
    """Two images with a few boxes each + one unlabeled image."""
    rng = np.random.RandomState(0)
    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    specs = {
        "mapA": (200, 260, [(0, 40, 40), (1, 120, 90), (1, 200, 150)]),
        "mapB": (180, 220, [(2, 60, 60)]),
        "mapC": (150, 150, []),
    }
    for name, (h, w, boxes) in specs.items():
        img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{name}.png"), img)
        rows = []
        for cls, cx, cy in boxes:
            bw, bh = 20, 14
            c8 = np.array([cx - bw / 2, cy - bh / 2, cx + bw / 2,
                           cy - bh / 2, cx + bw / 2, cy + bh / 2,
                           cx - bw / 2, cy + bh / 2], np.float64)
            c8[0::2] /= w
            c8[1::2] /= h
            rows.append([cls] + list(c8))
        if rows:
            L.write_labels(str(lbl_dir / f"{name}.txt"),
                           np.asarray(rows))
    return tmp_path


class TestBuildTrain:
    def test_pass1_and_empty_budget(self, corpus):
        out_i = str(corpus / "crop/images/train")
        out_l = str(corpus / "crop/labels/train")
        lst = str(corpus / "train_cropped100.txt")
        stats = DS.build_train_tiles(
            str(corpus / "images"), str(corpus / "labels"),
            out_i, out_l, lst, tile_size=100, overlap=20)
        assert stats["P_total"] > 0 and stats["E_total"] > 0

        with open(lst) as f:
            n_pos = len(f.read().strip().splitlines())
        assert n_pos == stats["P_total"]
        # every listed tile has a non-empty matching label
        assert DS.count_positives(out_l) == stats["P_total"]

        # pass 2: empty budget
        P_post = DS.count_positives(out_l)
        frac = min(1.0, 4 * P_post / stats["E_total"])
        r = DS.save_selected_empty_tiles(stats["empty_meta_path"], frac,
                                         lst)
        assert r["E_kept"] == int(round(frac * stats["E_total"]))
        with open(lst) as f:
            assert len(f.read().strip().splitlines()) == \
                stats["P_total"] + r["E_kept"]
        # selection must be deterministic (RandomState(42))
        r2 = DS.save_selected_empty_tiles(stats["empty_meta_path"], frac,
                                          str(corpus / "tmp.txt"))
        assert r2["E_kept"] == r["E_kept"]

    def test_tile_labels_normalized(self, corpus):
        out_i = str(corpus / "crop2/images")
        out_l = str(corpus / "crop2/labels")
        DS.build_train_tiles(
            str(corpus / "images"), str(corpus / "labels"),
            out_i, out_l, str(corpus / "l2.txt"), 100, 20)
        for fn in os.listdir(out_l):
            lab = L.read_labels(os.path.join(out_l, fn))
            if len(lab):
                assert (lab[:, 1:] >= 0).all() and (lab[:, 1:] <= 1).all()


class TestValTiler:
    def test_val_keeps_all_positives(self, corpus):
        out_i = str(corpus / "vcrop/images")
        out_l = str(corpus / "vcrop/labels")
        lst = str(corpus / "val_cropped.txt")
        DS.build_val_tiles(
            str(corpus / "images"), str(corpus / "labels"),
            out_i, out_l, lst, tile_size=100, overlap=20)
        n_pos = DS.count_positives(out_l)
        n_all = len([f for f in os.listdir(out_l) if f.endswith(".txt")])
        assert n_pos > 0
        # empties bounded by R_TARGET * positives (+rounding)
        assert n_all - n_pos <= 4 * n_pos + 1


class TestBalance:
    def test_oversamples_rare_class(self, corpus):
        out_i = str(corpus / "bcrop/images")
        out_l = str(corpus / "bcrop/labels")
        lst = str(corpus / "b.txt")
        DS.build_train_tiles(
            str(corpus / "images"), str(corpus / "labels"),
            out_i, out_l, lst, 100, 20)
        before = DS.class_distribution(out_l)
        DS.balance_classes(out_i, out_l, lst,
                           class_balance_threshold=5,
                           augmentation_repeats=1, seed=0)
        after = DS.class_distribution(out_l)
        for c, n in before.items():
            if n < 5:
                assert after[c] > n
        # augmented files follow the reference naming
        augs = [f for f in os.listdir(out_i) if "_aug_" in f]
        assert augs and all(
            any(t in f for t in ("_aug_scale_", "_aug_shift_",
                                 "_aug_hsv_")) for f in augs)


class TestAugmentOps:
    def test_hsv_roundtrip(self):
        rng = np.random.RandomState(1)
        bgr = rng.randint(0, 255, (1, 16, 16, 3)).astype(np.uint8)
        hsv = np.asarray(AUG.bgr_to_hsv_u8(jnp.asarray(bgr)))
        ref = cv2.cvtColor(bgr[0], cv2.COLOR_BGR2HSV).astype(np.float64)
        dh = np.abs(hsv[0][..., 0] - ref[..., 0])
        dh = np.minimum(dh, 180.0 - dh)  # H is circular mod 180
        assert dh.max() <= 1.0
        assert np.abs(hsv[0][..., 1:] - ref[..., 1:]).max() <= 1.5
        back = np.asarray(AUG.hsv_to_bgr_u8(jnp.asarray(hsv)))
        assert np.abs(back[0] - bgr[0]).max() <= 2.0

    def test_shift_matches_warpaffine(self):
        rng = np.random.RandomState(2)
        img = rng.randint(0, 255, (20, 24, 3)).astype(np.uint8)
        M = np.float32([[1, 0, 5], [0, 1, -3]])
        ref = cv2.warpAffine(img, M, (24, 20))
        got = np.asarray(AUG.shift_image(
            jnp.asarray(img[None], jnp.float32), 5, -3))[0]
        np.testing.assert_array_equal(got.astype(np.uint8), ref)


class TestLoader:
    def test_batches_shapes_and_labels(self, corpus):
        out_i = str(corpus / "lcrop/images")
        out_l = str(corpus / "lcrop/labels")
        lst = str(corpus / "lc.txt")
        DS.build_train_tiles(
            str(corpus / "images"), str(corpus / "labels"),
            out_i, out_l, lst, 100, 20)
        # loader expects images/ <-> labels/ sibling dirs
        ds = TileDataset(lst, tile_size=100, channels=3, max_labels=8)
        assert len(ds) > 0
        rng = np.random.RandomState(0)
        batch = next(ds.batches(2, rng, augment=False))
        assert batch["images"].shape == (2, 100, 100, 3)
        assert batch["gt_xywhr"].shape == (2, 8, 5)
        assert float(batch["images"].max()) <= 1.0
        if bool(batch["gt_mask"].any()):
            b, m = np.where(np.asarray(batch["gt_mask"]))
            boxes = np.asarray(batch["gt_xywhr"])[b, m]
            assert (boxes[:, 2] > 0).all() and (boxes[:, 3] > 0).all()
            assert (boxes[:, :2] >= 0).all() and (boxes[:, :2] <= 100).all()

    def test_augment_path_runs(self, corpus):
        out_i = str(corpus / "l2crop/images")
        out_l = str(corpus / "l2crop/labels")
        lst = str(corpus / "lc2.txt")
        DS.build_train_tiles(
            str(corpus / "images"), str(corpus / "labels"),
            out_i, out_l, lst, 100, 20)
        ds = TileDataset(lst, tile_size=100)
        batch = next(ds.batches(2, np.random.RandomState(3),
                                augment=True))
        assert np.isfinite(np.asarray(batch["images"])).all()


class TestDeviceMosaic:
    """Device gather/compose/warp mosaic vs the host mirror path: the two
    modes must produce BIT-IDENTICAL batches for the same rng stream."""

    def _build(self, corpus, name):
        out_i = str(corpus / f"{name}/images")
        out_l = str(corpus / f"{name}/labels")
        lst = str(corpus / f"{name}.txt")
        DS.build_train_tiles(
            str(corpus / "images"), str(corpus / "labels"),
            out_i, out_l, lst, 100, 20)
        return TileDataset(lst, tile_size=100, channels=3, max_labels=8)

    def test_device_equals_host_batches(self, corpus):
        ds = self._build(corpus, "dmcrop")
        assert ds.device_cache() is not None
        b_dev = list(ds.batches(2, np.random.RandomState(5), augment=True,
                                device_mosaic=True))
        b_host = list(ds.batches(2, np.random.RandomState(5), augment=True,
                                 device_mosaic=False))
        assert len(b_dev) == len(b_host) > 0
        for bd, bh in zip(b_dev, b_host):
            assert (np.asarray(bd["gt_labels"])
                    == np.asarray(bh["gt_labels"])).all()
            assert (np.asarray(bd["gt_mask"])
                    == np.asarray(bh["gt_mask"])).all()
            np.testing.assert_array_equal(np.asarray(bd["gt_xywhr"]),
                                          np.asarray(bh["gt_xywhr"]))
            np.testing.assert_array_equal(np.asarray(bd["images"]),
                                          np.asarray(bh["images"]))

    def test_mosaic4_labels_within_bounds(self, corpus):
        ds = self._build(corpus, "dmcrop2")
        rng = np.random.RandomState(9)
        for _ in range(4):
            img, cls, c8 = ds.mosaic4(0, rng)
            assert img.shape == (100, 100, 3)
            if len(c8):
                cx = c8[:, 0::2].mean(1)
                cy = c8[:, 1::2].mean(1)
                assert (cx >= 0).all() and (cx < 100).all()
                assert (cy >= 0).all() and (cy < 100).all()
