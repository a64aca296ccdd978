"""Training batch loader for the tile dataset.

Feeds the trainer from the list files the dataset builder writes
(`train_cropped{TS}.txt` etc.), replacing the ultralytics dataloader the
reference relies on (SURVEY.md §2.2 "OBB dataset loader"): list-file
dataset, YOLO-OBB 8-point normalized labels -> (cx,cy,w,h,theta) targets,
uint8 tiles -> float batches, with train-time augmentation (horizontal
flip + HSV jitter at engine-default probabilities) applied device-batched.

Batches are padded to static shapes: images [B, ts, ts, C] float 0..1,
gt_labels [B, M], gt_xywhr [B, M, 5] in pixels, gt_mask [B, M].
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

from ..ops import geometry as G
from . import labels as L


def load_tile(path: str, channels: int = 3) -> np.ndarray:
    """Read a tile image as NETWORK channel order: [H, W, 3] uint8 RGB for
    jpg/png (cv2 reads BGR; the inference path feeds RGB via
    `build_multich`, and ultralytics' own loader flips BGR->RGB — train
    and predict must match), or [R,G,B,DT] for multipage 4ch tiffs
    (`Train_OBB.py:271-282`, already in channel order)."""
    import cv2

    if path.lower().endswith((".tif", ".tiff")):
        ok, pages = cv2.imreadmulti(path, flags=cv2.IMREAD_GRAYSCALE)
        if not ok:
            raise IOError(f"cannot read tiff: {path}")
        return np.stack(pages, axis=-1)
    img = cv2.imread(path)
    if img is None:
        raise IOError(f"cannot read image: {path}")
    return img[..., ::-1]  # BGR -> RGB


_AUG_CACHE: dict = {}


def _augment_batch_fn(channels: int):
    """One jitted program for the whole batch's device-side augmentation
    (flip + HSV): eager per-op dispatch costs tunnel RPCs per op in this
    environment, which dominated epoch time."""
    if channels in _AUG_CACHE:
        return _AUG_CACHE[channels]

    import jax
    import jax.numpy as jnp

    from ..ops import augment as AUG

    @jax.jit
    def aug(x, gb, flips, sg, vg, ts):
        fl = flips[:, None, None, None]
        x = jnp.where(fl, AUG.fliplr_image(x), x)
        if channels == 3:
            x = AUG.hsv_jitter(x, sg, vg)
        gb = jnp.where(
            flips[:, None, None],
            gb.at[..., 0].set(ts - gb[..., 0]).at[..., 4].multiply(-1.0),
            gb)
        return x / 255.0, gb

    _AUG_CACHE[channels] = aug
    return aug


def label_path_for_tile(image_path: str) -> str:
    """images/ -> labels/ sibling layout used by the dataset builder."""
    d, fn = os.path.split(image_path)
    stem = os.path.splitext(fn)[0]
    cand = os.path.join(d.replace(
        f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"),
        stem + ".txt")
    if os.path.exists(cand):
        return cand
    return os.path.join(d, stem + ".txt")


class TileDataset:
    """List-file dataset of (tile image, normalized OBB labels)."""

    def __init__(self, list_file: str, tile_size: int, channels: int = 3,
                 max_labels: int = 64):
        with open(list_file) as f:
            self.paths = [ln.strip() for ln in f if ln.strip()]
        self.tile_size = tile_size
        self.channels = channels
        self.max_labels = max_labels

    def __len__(self):
        return len(self.paths)

    def get(self, i: int):
        p = self.paths[i]
        img = load_tile(p, self.channels)
        lab = L.read_labels(label_path_for_tile(p))
        return img, lab

    def _get_sized(self, i: int):
        """Tile resized to (ts, ts) with labels in PIXEL corner coords."""
        import cv2

        ts = self.tile_size
        img, lab = self.get(i)
        if img.shape[:2] != (ts, ts):
            img = cv2.resize(img, (ts, ts))
        c8 = lab[:, 1:] * ts if len(lab) else np.zeros((0, 8))
        cls = lab[:, 0] if len(lab) else np.zeros((0,))
        return img, cls, c8

    def mosaic4(self, i: int, rng: np.random.RandomState):
        """4-tile mosaic + random scale/translate affine back to (ts, ts),
        engine-style (mosaic=1.0, scale=0.5, translate=0.1). Returns
        (image uint8 [ts,ts,C], cls [N], corners8 px [N,8])."""
        import cv2

        ts = self.tile_size
        idxs = [i] + list(rng.randint(0, len(self.paths), 3))
        canvas = np.full((2 * ts, 2 * ts, self.channels), 114, np.uint8)
        yc = int(rng.uniform(0.5 * ts, 1.5 * ts))
        xc = int(rng.uniform(0.5 * ts, 1.5 * ts))
        cls_all, c8_all = [], []
        for k, idx in enumerate(idxs):
            img, cls, c8 = self._get_sized(idx)
            if k == 0:    # top-left of center
                x1a, y1a = max(xc - ts, 0), max(yc - ts, 0)
                x2a, y2a = xc, yc
                x1b, y1b = ts - (x2a - x1a), ts - (y2a - y1a)
            elif k == 1:  # top-right
                x1a, y1a = xc, max(yc - ts, 0)
                x2a, y2a = min(xc + ts, 2 * ts), yc
                x1b, y1b = 0, ts - (y2a - y1a)
            elif k == 2:  # bottom-left
                x1a, y1a = max(xc - ts, 0), yc
                x2a, y2a = xc, min(yc + ts, 2 * ts)
                x1b, y1b = ts - (x2a - x1a), 0
            else:         # bottom-right
                x1a, y1a = xc, yc
                x2a, y2a = min(xc + ts, 2 * ts), min(yc + ts, 2 * ts)
                x1b, y1b = 0, 0
            x2b, y2b = x1b + (x2a - x1a), y1b + (y2a - y1a)
            canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            if len(c8):
                shifted = c8.copy()
                shifted[:, 0::2] += x1a - x1b
                shifted[:, 1::2] += y1a - y1b
                cls_all.append(cls)
                c8_all.append(shifted)

        cls_m = np.concatenate(cls_all) if cls_all else np.zeros((0,))
        c8_m = np.concatenate(c8_all) if c8_all else np.zeros((0, 8))

        # affine: scale U(0.5, 1.5), translate +-0.1, output ts x ts
        s = rng.uniform(0.5, 1.5)
        tx = ts * (0.5 + rng.uniform(-0.1, 0.1)) - s * ts
        ty = ts * (0.5 + rng.uniform(-0.1, 0.1)) - s * ts
        M = np.array([[s, 0, tx], [0, s, ty]], np.float32)
        out = cv2.warpAffine(canvas, M, (ts, ts),
                             borderValue=(114,) * self.channels)
        if out.ndim == 2:
            out = out[..., None]
        if len(c8_m):
            pts = c8_m.reshape(-1, 4, 2)
            pts = pts * s + np.array([tx, ty])
            c8_m = pts.reshape(-1, 8)
            cx = c8_m[:, 0::2].mean(1)
            cy = c8_m[:, 1::2].mean(1)
            wh_ok = (np.ptp(c8_m[:, 0::2], axis=1) > 2) & \
                    (np.ptp(c8_m[:, 1::2], axis=1) > 2)
            keep = (cx >= 0) & (cx < ts) & (cy >= 0) & (cy < ts) & wh_ok
            cls_m, c8_m = cls_m[keep], c8_m[keep]
        return out, cls_m, c8_m

    def batches(self, batch_size: int, rng: np.random.RandomState,
                shuffle: bool = True, augment: bool = True,
                mosaic_p: float = 1.0, fliplr_p: float = 0.5,
                hsv_s: float = 0.7, hsv_v: float = 0.4,
                drop_last: bool = True) -> Iterator[dict]:
        """Yield padded batch dicts ready for the train step."""
        import jax.numpy as jnp


        order = np.arange(len(self.paths))
        if shuffle:
            rng.shuffle(order)

        ts, M = self.tile_size, self.max_labels
        n = len(order)
        end = n - (n % batch_size) if drop_last else n
        for s in range(0, max(end, 0), batch_size):
            idx = order[s:s + batch_size]
            B = len(idx)
            imgs = np.zeros((B, ts, ts, self.channels), np.uint8)
            gl = np.zeros((B, M), np.int32)
            gb = np.zeros((B, M, 5), np.float32)
            gm = np.zeros((B, M), bool)
            for bi, i in enumerate(idx):
                if augment and rng.rand() < mosaic_p:
                    img, cls, c8 = self.mosaic4(i, rng)
                else:
                    img, cls, c8 = self._get_sized(i)
                imgs[bi] = img
                if len(cls):
                    cls, c8 = cls[:M], c8[:M]
                    xywhr = G.corners8_to_xywhr_np(c8)
                    k = len(cls)
                    gl[bi, :k] = cls.astype(np.int32)
                    gb[bi, :k] = xywhr
                    gm[bi, :k] = True

            x = jnp.asarray(imgs, jnp.float32)
            gbj = jnp.asarray(gb)
            if augment:
                # horizontal flip (per-sample), HSV jitter (per-batch),
                # executed as ONE jitted device program
                flips = rng.rand(B) < fliplr_p
                sg = max(1.0 + rng.uniform(-1, 1) * hsv_s, 0.0)
                vg = max(1.0 + rng.uniform(-1, 1) * hsv_v, 0.0)
                aug = _augment_batch_fn(self.channels)
                x, gbj = aug(x, gbj, jnp.asarray(flips),
                             jnp.float32(sg), jnp.float32(vg),
                             jnp.float32(ts))
            else:
                x = x / 255.0

            yield {
                "images": x,
                "gt_labels": jnp.asarray(gl),
                "gt_xywhr": gbj,
                "gt_mask": jnp.asarray(gm),
            }
