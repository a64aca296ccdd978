"""Training batch loader for the tile dataset.

Feeds the trainer from the list files the dataset builder writes
(`train_cropped{TS}.txt` etc.), replacing the ultralytics dataloader the
reference relies on (SURVEY.md §2.2 "OBB dataset loader"): list-file
dataset, YOLO-OBB 8-point normalized labels -> (cx,cy,w,h,theta) targets,
uint8 tiles -> float batches, with train-time augmentation (mosaic-4 +
horizontal flip + HSV jitter at engine-default probabilities).

The ENTIRE pixel path of the augmentation runs on device: the tile set is
uploaded once as a [N, ts, ts, C] device cache, and each batch is one
jitted program — gather 4 tiles/sample -> compose the 2ts x 2ts mosaic
canvas (paste-as-gather) -> fixed-point affine warp (`ops/warp.py`) ->
flip/HSV -> /255. No per-batch image H2D, no host cv2 warp in the hot
loop (round-1 used cv2.warpAffine per sample). A host-mirror path
(`mosaic4`, bit-identical by construction) remains for memory-constrained
fallback and as the oracle in tests.

Batches are padded to static shapes: images [B, ts, ts, C] float 0..1,
gt_labels [B, M], gt_xywhr [B, M, 5] in pixels, gt_mask [B, M].
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

from ..ops import geometry as G
from ..ops import warp as W
from . import labels as L

# device tile caches larger than this fall back to the host mosaic path.
# v5e has 16 GB HBM; the x-416-b16 train step needs ~0.7 GB f32 state
# (params+EMA+momentum) plus transient activations, so an 8 GB cache
# still leaves headroom — the GeoMap-real 416 build (11,925 tiles,
# 6.2 GB) must ride the device path: on this 1-core host the fallback
# mosaic (64 jpg decodes + numpy warp per 16-batch) costs ~0.46 s/step
# vs 59 ms device-bound (r05 flagship run).
DEVICE_CACHE_BUDGET_BYTES = 8 << 30

# host decoded-tile cache (the device-path fallback AND the val loop
# both re-decode jpgs per access otherwise; this box has 1 CPU core and
# ~125 GB RAM, so trading RAM for decode time is free)
HOST_CACHE_BUDGET_BYTES = 32 << 30


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
            # per-SAMPLE gains [B] (the engine draws HSV per image;
            # drawing once per batch reduced augmentation diversity,
            # VERDICT r02 #3)
            x = AUG.hsv_jitter(x, sg[:, None, None], vg[:, None, None])
        gb = jnp.where(
            flips[:, None, None],
            gb.at[..., 0].set(ts - gb[..., 0]).at[..., 4].multiply(-1.0),
            gb)
        return x / 255.0, gb

    _AUG_CACHE[channels] = aug
    return aug


_MOSAIC_CACHE: dict = {}
_MOSAIC_BODY_CACHE: dict = {}   # unjitted bodies, shared by the packed fn


def _mosaic_batch_fn(ts: int, channels: int):
    """The fused per-batch device program: gather 4 cached tiles/sample ->
    mosaic canvas (paste-as-gather, no dynamic shapes) -> fixed-point
    affine warp -> flip -> HSV -> /255. One dispatch per batch, zero image
    H2D."""
    key = (ts, channels)
    if key in _MOSAIC_CACHE:
        return _MOSAIC_CACHE[key]

    import jax
    import jax.numpy as jnp

    from ..ops import augment as AUG

    border = (114,) * channels

    def compose(t4, yc1, xc1):
        """2ts x 2ts mosaic canvas from 4 [ts,ts,C] tiles and the random
        center. The tiles always form a fixed 2x2 grid shifted so its
        center lands on (yc, xc): a dynamic ROLL of the static grid,
        with the wrapped strips (exactly the canvas area no tile
        covers) masked to the border value. Values are identical to the
        per-pixel quadrant gather this replaces, but rolls lower to
        slices+concat instead of an element-granular gather (which cost
        ~0.4 s/batch on v5e — r05 flagship diagnosis)."""
        grid = jnp.concatenate([
            jnp.concatenate([t4[0], t4[1]], axis=1),
            jnp.concatenate([t4[2], t4[3]], axis=1)], axis=0)
        rolled = jnp.roll(grid, shift=(yc1 - ts, xc1 - ts), axis=(0, 1))
        rr = jnp.arange(2 * ts)
        oky = (rr >= yc1 - ts) & (rr < yc1 + ts)
        okx = (rr >= xc1 - ts) & (rr < xc1 + ts)
        ok = oky[:, None] & okx[None, :]
        return jnp.where(ok[..., None], rolled,
                         jnp.asarray(border, jnp.uint8))

    def warp_one(canvas, ad, bd, X0, Y0):
        # mosaic affines are scale+translate only (mosaic_params), so
        # bd == 0 and X0 is constant: the axis-separable warp applies
        # (bit-identical, two 1-D axis gathers instead of per-pixel 2-D)
        return W.warp_axis_aligned_u8_dev(canvas, ad, X0, Y0, border)

    def run(cache, idxs, yc, xc, ad, bd, X0, Y0, is_mosaic,
            gb, flips, sg, vg):
        tiles = cache[idxs]                            # [B, 4, ts, ts, C]
        canvas = jax.vmap(compose)(tiles, yc, xc)
        warped = jax.vmap(warp_one)(canvas, ad, bd, X0, Y0)
        imgs = jnp.where(is_mosaic[:, None, None, None],
                         warped, tiles[:, 0])
        x = imgs.astype(jnp.float32)
        fl = flips[:, None, None, None]
        x = jnp.where(fl, AUG.fliplr_image(x), x)
        if channels == 3:
            # per-SAMPLE gains [B], see _augment_batch_fn
            x = AUG.hsv_jitter(x, sg[:, None, None], vg[:, None, None])
        gb = jnp.where(
            flips[:, None, None],
            gb.at[..., 0].set(float(ts) - gb[..., 0])
              .at[..., 4].multiply(-1.0),
            gb)
        return x / 255.0, gb

    _MOSAIC_BODY_CACHE[key] = run
    _MOSAIC_CACHE[key] = jax.jit(run)
    return _MOSAIC_CACHE[key]


_MOSAIC_PACKED_CACHE: dict = {}


def _mosaic_batch_packed_fn(ts: int, channels: int, M: int):
    """Packed-upload variant of `_mosaic_batch_fn`: every per-batch host
    input rides in TWO uploads (one int32 pack, one float32 pack) instead
    of ~13 separate `jnp.asarray` transfers. Each H2D transfer through
    this box's tunnel costs ~35-70 ms of RPC latency regardless of size
    (CLAUDE.md), so the unpacked path spends ~0.5-0.7 s per training step
    on upload latency alone — device compute is ~12-60 ms. Numerics are
    bit-identical: the packs are exact int32/float32 round-trips and the
    compute body is shared with `_mosaic_batch_fn`.

    int32 pack layout per sample (width 8 + 4*ts + 2*M):
      [0:4] tile idxs | [4] yc | [5] xc | [6:6+4*ts] ad/bd/X0/Y0 warp
      tables | [..] is_mosaic | [..] flip | [..:+M] gt_labels |
      [..:+M] gt_mask
    float32 pack layout (width 5*M + 2): gt_xywhr.flat | sg | vg
    Returns (images, gt_xywhr, gt_labels, gt_mask) — the full batch.
    """
    key = (ts, channels, M)
    if key in _MOSAIC_PACKED_CACHE:
        return _MOSAIC_PACKED_CACHE[key]

    import jax

    _mosaic_batch_fn(ts, channels)          # populate the body cache
    # the underlying traced body, not the jitted wrapper: one program
    inner = _MOSAIC_BODY_CACHE[(ts, channels)]

    @jax.jit
    def run(cache, ipack, fpack):
        o = 6 + 4 * ts
        idxs = ipack[:, 0:4]
        yc, xc = ipack[:, 4], ipack[:, 5]
        ad = ipack[:, 6:6 + ts]
        bd = ipack[:, 6 + ts:6 + 2 * ts]
        X0 = ipack[:, 6 + 2 * ts:6 + 3 * ts]
        Y0 = ipack[:, 6 + 3 * ts:6 + 4 * ts]
        is_mos = ipack[:, o] != 0
        flips = ipack[:, o + 1] != 0
        gl = ipack[:, o + 2:o + 2 + M]
        gm = ipack[:, o + 2 + M:o + 2 + 2 * M] != 0
        B = ipack.shape[0]
        gb = fpack[:, :5 * M].reshape(B, M, 5)
        sg, vg = fpack[:, 5 * M], fpack[:, 5 * M + 1]
        x, gb = inner(cache, idxs, yc, xc, ad, bd, X0, Y0, is_mos,
                      gb, flips, sg, vg)
        return x, gb, gl, gm

    _MOSAIC_PACKED_CACHE[key] = run
    return run


def mosaic_p_for_epoch(epoch: int, total_epochs: int, close_mosaic: int,
                       base_p: float = 1.0) -> float:
    """Engine close_mosaic semantics (`Train_OBB.py:796-841` via the
    ultralytics trainer default close_mosaic=10): mosaic is disabled from
    epoch `total_epochs - close_mosaic` onward — and never, when the run
    is shorter than the close-out window (the engine's trigger epoch
    would be negative and never fires)."""
    thr = total_epochs - close_mosaic
    if close_mosaic > 0 and 0 <= thr <= epoch:
        return 0.0
    return base_p


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
        self._dev_cache = None          # jnp [N, ts, ts, C] uint8
        self._dev_cache_failed = False
        self._host_sized = None         # idx -> (img, cls, c8) memo
        self._host_labels: dict = {}    # idx -> (cls, c8) memo

    def __len__(self):
        return len(self.paths)

    def device_cache(self):
        """All tiles resized to (ts, ts) as ONE device-resident uint8
        array (single H2D — this box throttles host->device transfers, so
        per-batch image uploads dominated epoch time). Returns None when
        the set exceeds DEVICE_CACHE_BUDGET_BYTES or an image fails."""
        if self._dev_cache is not None or self._dev_cache_failed:
            return self._dev_cache
        import cv2
        import jax.numpy as jnp

        ts, C, N = self.tile_size, self.channels, len(self.paths)
        if N * ts * ts * C > DEVICE_CACHE_BUDGET_BYTES:
            self._dev_cache_failed = True
            return None
        arr = np.zeros((N, ts, ts, C), np.uint8)
        try:
            for i, p in enumerate(self.paths):
                img = load_tile(p, C)
                if img.shape[:2] != (ts, ts):
                    img = cv2.resize(img, (ts, ts))
                    if img.ndim == 2:
                        img = img[..., None]
                arr[i] = img
        except Exception as e:
            print(f"[Loader] device cache disabled: {e}")
            self._dev_cache_failed = True
            return None
        self._dev_cache = jnp.asarray(arr)
        return self._dev_cache

    def get(self, i: int):
        p = self.paths[i]
        img = load_tile(p, self.channels)
        lab = L.read_labels(label_path_for_tile(p))
        return img, lab

    def _get_sized(self, i: int):
        """Tile resized to (ts, ts) with labels in PIXEL corner coords.

        Memoized in host RAM when the set fits HOST_CACHE_BUDGET_BYTES:
        the host mosaic path touches 4 tiles per sample and jpg decode
        on this 1-core box costs ~4 ms each — an uncached x-416-b16
        epoch is decode-bound. Returned arrays are READ-ONLY by
        contract (every caller copies or slices)."""
        if self._host_sized is None:
            ts_, C, N = self.tile_size, self.channels, len(self.paths)
            self._host_sized = {} if N * ts_ * ts_ * C <= \
                HOST_CACHE_BUDGET_BYTES else False
        if self._host_sized is not False and i in self._host_sized:
            return self._host_sized[i]
        import cv2

        ts = self.tile_size
        img, lab = self.get(i)
        if img.shape[:2] != (ts, ts):
            img = cv2.resize(img, (ts, ts))
        c8 = lab[:, 1:] * ts if len(lab) else np.zeros((0, 8))
        cls = lab[:, 0] if len(lab) else np.zeros((0,))
        if self._host_sized is not False:
            self._host_sized[i] = (img, cls, c8)
        return img, cls, c8

    def mosaic_params(self, i: int, rng: np.random.RandomState):
        """All randomness of one mosaic sample, drawn in the same rng call
        order as round-1's mosaic4 (streams stay reproducible):
        (idxs[4], yc, xc, s, tx, ty) — mosaic=1.0, scale U(0.5,1.5),
        translate +-0.1, engine-style."""
        ts = self.tile_size
        idxs = [i] + list(rng.randint(0, len(self.paths), 3))
        yc = int(rng.uniform(0.5 * ts, 1.5 * ts))
        xc = int(rng.uniform(0.5 * ts, 1.5 * ts))
        s = rng.uniform(0.5, 1.5)
        tx = ts * (0.5 + rng.uniform(-0.1, 0.1)) - s * ts
        ty = ts * (0.5 + rng.uniform(-0.1, 0.1)) - s * ts
        return idxs, yc, xc, s, tx, ty

    def _labels_sized(self, i: int):
        """Labels of tile i in PIXEL corner coords at (ts, ts).
        Memoized: the device-mosaic path still computes label math on
        the host, touching 4 label FILES per sample — at b16 that is 64
        reads+parses per batch on a 1-core box. Read-only contract
        (mosaic_labels copies before mutating)."""
        hit = self._host_labels.get(i)
        if hit is not None:
            return hit
        lab = L.read_labels(label_path_for_tile(self.paths[i]))
        ts = self.tile_size
        c8 = lab[:, 1:] * ts if len(lab) else np.zeros((0, 8))
        cls = lab[:, 0] if len(lab) else np.zeros((0,))
        self._host_labels[i] = (cls, c8)
        return cls, c8

    def mosaic_labels(self, params):
        """Label math of the mosaic (host, bit-identical to round-1):
        per-tile shift into canvas coords, affine, center/keep filter."""
        idxs, yc, xc, s, tx, ty = params
        ts = self.tile_size
        cls_all, c8_all = [], []
        for k, idx in enumerate(idxs):
            cls, c8 = self._labels_sized(idx)
            if len(c8):
                shifted = c8.copy()
                # x1a - x1b / y1a - y1b of the paste rectangles reduce to
                # center offsets: low side of the center shifts by -ts
                shifted[:, 0::2] += (xc - ts) if k in (0, 2) else xc
                shifted[:, 1::2] += (yc - ts) if k in (0, 1) else yc
                cls_all.append(cls)
                c8_all.append(shifted)
        cls_m = np.concatenate(cls_all) if cls_all else np.zeros((0,))
        c8_m = np.concatenate(c8_all) if c8_all else np.zeros((0, 8))
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
        return cls_m, c8_m

    def mosaic_pixels_host(self, params) -> np.ndarray:
        """Host mirror of the device mosaic pixel path (fallback when the
        device cache is unavailable; oracle in tests). Bit-identical to
        `_mosaic_batch_fn` by construction (same paste arithmetic, same
        fixed-point warp)."""
        idxs, yc, xc, s, tx, ty = params
        ts = self.tile_size
        canvas = np.full((2 * ts, 2 * ts, self.channels), 114, np.uint8)
        for k, idx in enumerate(idxs):
            img, _, _ = self._get_sized(idx)
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
        M = np.array([[s, 0, tx], [0, s, ty]], np.float64)
        return W.warp_affine_u8_np(canvas, W.invert_affine(M), ts, ts,
                                   (114,) * self.channels)

    def mosaic4(self, i: int, rng: np.random.RandomState):
        """4-tile mosaic + random scale/translate affine back to (ts, ts).
        Returns (image uint8 [ts,ts,C], cls [N], corners8 px [N,8])."""
        params = self.mosaic_params(i, rng)
        cls_m, c8_m = self.mosaic_labels(params)
        return self.mosaic_pixels_host(params), cls_m, c8_m

    def batches(self, batch_size: int, rng: np.random.RandomState,
                shuffle: bool = True, augment: bool = True,
                mosaic_p: float = 1.0, fliplr_p: float = 0.5,
                hsv_s: float = 0.7, hsv_v: float = 0.4,
                drop_last: bool = True,
                device_mosaic: bool | None = None) -> Iterator[dict]:
        """Yield padded batch dicts ready for the train step.

        device_mosaic: True = gather/compose/warp on device from the tile
        cache (default when the cache fits the budget), False = host
        mirror path. Both paths produce BIT-IDENTICAL batches for the
        same rng (tested)."""
        import jax.numpy as jnp

        cache = None
        if augment and device_mosaic is not False:
            cache = self.device_cache()
            if cache is None and device_mosaic is True:
                raise RuntimeError("device mosaic requested but the tile "
                                   "cache could not be built")
        use_dev = cache is not None

        order = np.arange(len(self.paths))
        if shuffle:
            rng.shuffle(order)

        ts, M = self.tile_size, self.max_labels
        n = len(order)
        end = n - (n % batch_size) if drop_last else n
        for s in range(0, max(end, 0), batch_size):
            idx = order[s:s + batch_size]
            B = len(idx)
            gl = np.zeros((B, M), np.int32)
            gb = np.zeros((B, M, 5), np.float32)
            gm = np.zeros((B, M), bool)
            imgs = None if use_dev else np.zeros(
                (B, ts, ts, self.channels), np.uint8)
            # device-path per-sample params
            tidx = np.zeros((B, 4), np.int32)
            yc = np.zeros((B,), np.int32)
            xc = np.zeros((B,), np.int32)
            wtab = np.zeros((B, 4, ts), np.int32)  # adelta/bdelta/X0/Y0
            is_mos = np.zeros((B,), bool)

            for bi, i in enumerate(idx):
                if augment and rng.rand() < mosaic_p:
                    params = self.mosaic_params(i, rng)
                    cls, c8 = self.mosaic_labels(params)
                    if use_dev:
                        idxs, yc_i, xc_i, sc, tx, ty = params
                        tidx[bi], yc[bi], xc[bi] = idxs, yc_i, xc_i
                        Minv = W.invert_affine(
                            np.array([[sc, 0, tx], [0, sc, ty]]))
                        wtab[bi] = W.affine_deltas(Minv, ts, ts)
                        is_mos[bi] = True
                    else:
                        imgs[bi] = self.mosaic_pixels_host(params)
                else:
                    if use_dev:
                        tidx[bi] = i
                        cls, c8 = self._labels_sized(i)
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

            if augment and use_dev:
                # horizontal flip and HSV jitter, both per-sample
                # (the engine draws HSV gains per image) — SAME rng draw
                # order as the host path below
                flips = rng.rand(B) < fliplr_p
                sg = np.maximum(1.0 + rng.uniform(-1, 1, B) * hsv_s, 0.0)
                vg = np.maximum(1.0 + rng.uniform(-1, 1, B) * hsv_v, 0.0)
                # every per-batch host input rides in TWO uploads: each
                # H2D transfer costs ~35-70 ms tunnel RPC latency here,
                # and the 13-transfer layout dominated epoch wall time
                run = _mosaic_batch_packed_fn(ts, self.channels, M)
                o = 6 + 4 * ts
                ipack = np.zeros((B, o + 2 + 2 * M), np.int32)
                ipack[:, 0:4] = tidx
                ipack[:, 4] = yc
                ipack[:, 5] = xc
                ipack[:, 6:o] = wtab.reshape(B, 4 * ts)
                ipack[:, o] = is_mos
                ipack[:, o + 1] = flips
                ipack[:, o + 2:o + 2 + M] = gl
                ipack[:, o + 2 + M:] = gm
                fpack = np.empty((B, 5 * M + 2), np.float32)
                fpack[:, :5 * M] = gb.reshape(B, 5 * M)
                fpack[:, 5 * M] = sg
                fpack[:, 5 * M + 1] = vg
                x, gbj, glj, gmj = run(cache, jnp.asarray(ipack),
                                       jnp.asarray(fpack))
                yield {
                    "images": x,
                    "gt_labels": glj,
                    "gt_xywhr": gbj,
                    "gt_mask": gmj,
                }
                continue

            gbj = jnp.asarray(gb)
            if augment:      # host-pixel fallback path (use_dev=False)
                flips = rng.rand(B) < fliplr_p
                sg = np.maximum(1.0 + rng.uniform(-1, 1, B) * hsv_s, 0.0)
                vg = np.maximum(1.0 + rng.uniform(-1, 1, B) * hsv_v, 0.0)
                aug = _augment_batch_fn(self.channels)
                x, gbj = aug(jnp.asarray(imgs, jnp.float32), gbj,
                             jnp.asarray(flips),
                             jnp.asarray(sg, jnp.float32),
                             jnp.asarray(vg, jnp.float32),
                             jnp.float32(ts))
            else:
                x = jnp.asarray(imgs, jnp.float32) / 255.0

            yield {
                "images": x,
                "gt_labels": jnp.asarray(gl),
                "gt_xywhr": gbj,
                "gt_mask": jnp.asarray(gm),
            }
