"""Tiling engine: sliding-window grids, batched device tile extraction,
tile->global stitching, border filtering.

The reference crops tiles one at a time in a Python loop and runs a separate
model call per tile (`Detect_OBB.py:216-266`). Here the grid is a static
index computation and all tiles are gathered into ONE [T, ts, ts, C] batch
on device (a vmapped `dynamic_slice` from an image padded with the letterbox
value), so a single jitted forward covers the whole map — the core
serialization the TPU rebuild removes.

Two grid semantics, matching the reference exactly:

* **inference grid** (`Detect_OBB.py:216-221`): steps of `max(1, ts-ov)`
  covering every start < H/W, partial edge tiles included (crop w/h may be
  smaller than ts). Out-of-image area is padded with 114 (the YOLO letterbox
  gray), preserving static shapes.
* **train grid** (`Train_OBB.py:88-91`): same stride but tiles that would
  overrun the image are SKIPPED (full tiles only).

Label-to-tile assignment for dataset building follows `Train_OBB.py:93-108`:
midpoint ((x1+x4)/2,(y1+y4)/2) ownership, AABB coverage fraction >=
`object_boundary_threshold`, shift/clip/renormalize.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PAD_VALUE = 114  # ultralytics letterbox fill


# ---------------------------------------------------------------------------
# Host grid computations (shape-only; cheap, static per image size)
# ---------------------------------------------------------------------------

def inference_tile_grid(h: int, w: int, tile_size: int, overlap: int
                        ) -> np.ndarray:
    """All inference tiles as [T, 4] int32 rows (x0, y0, crop_w, crop_h).

    Partial edge tiles included: crop_w/h = min(tile_size, remaining).
    """
    step = max(1, tile_size - overlap)
    rows = []
    for y in range(0, h, step):
        for x in range(0, w, step):
            ch = min(y + tile_size, h) - y
            cw = min(x + tile_size, w) - x
            if ch <= 0 or cw <= 0:
                continue
            rows.append((x, y, cw, ch))
    return np.asarray(rows, dtype=np.int32).reshape(-1, 4)


def train_tile_grid(h: int, w: int, tile_size: int, overlap: int
                    ) -> np.ndarray:
    """Full tiles only, [T, 2] int32 rows (x0, y0); stride = ts - overlap
    (must be positive, `Train_OBB.py:56`)."""
    stride = tile_size - overlap
    assert stride > 0, "overlap must be < tile_size"
    rows = [
        (x, y)
        for y in range(0, h, stride)
        for x in range(0, w, stride)
        if y + tile_size <= h and x + tile_size <= w
    ]
    return np.asarray(rows, dtype=np.int32).reshape(-1, 2)


# ---------------------------------------------------------------------------
# Device tile gather
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("tile_size",))
def extract_tiles(image: jnp.ndarray, starts_xy: jnp.ndarray,
                  tile_size: int) -> jnp.ndarray:
    """Gather [T, ts, ts, C] tiles from image [H, W, C].

    Out-of-bounds area (partial edge tiles) is filled with PAD_VALUE,
    matching letterbox semantics. starts_xy is [T, 2] (x0, y0).
    """
    ts = tile_size
    padded = jnp.pad(
        image, ((0, ts), (0, ts), (0, 0)), constant_values=PAD_VALUE)

    def one(start):
        zero = jnp.zeros((), dtype=start.dtype)
        return jax.lax.dynamic_slice(
            padded, (start[1], start[0], zero),
            (ts, ts, image.shape[-1]))

    return jax.vmap(one)(starts_xy)


@partial(jax.jit, static_argnames=("tile_size",))
def extract_tiles_rowgather(image: jnp.ndarray, starts_xy: jnp.ndarray,
                            tile_size: int) -> jnp.ndarray:
    """Alternative tile gather: one row-gather + one col-gather instead of
    a vmapped dynamic_slice (A/B choice for TPU; identical results)."""
    ts = tile_size
    padded = jnp.pad(
        image, ((0, ts), (0, ts), (0, 0)), constant_values=PAD_VALUE)
    iy = jnp.arange(ts, dtype=starts_xy.dtype)
    rows = starts_xy[:, 1][:, None] + iy          # [T, ts]
    cols = starts_xy[:, 0][:, None] + iy          # [T, ts]
    strips = padded[rows]                          # [T, ts, Wp, C]
    return jnp.take_along_axis(
        strips, cols[:, None, :, None], axis=2)


def stitch_to_global(corners8_tile: jnp.ndarray, starts_xy: jnp.ndarray
                     ) -> jnp.ndarray:
    """Shift tile-local corner coords [T, N, 8] to global by tile origins
    [T, 2] (`Detect_OBB.py:233-240`)."""
    off = jnp.tile(starts_xy.astype(corners8_tile.dtype), (1, 4))  # [T, 8]
    return corners8_tile + off[:, None, :]


def border_keep_mask(centers_global: jnp.ndarray, tiles_xywh: jnp.ndarray,
                     margin_px: float) -> jnp.ndarray:
    """Center-margin border filter (`Detect_OBB.py:167-174`):
    keep iff the detection center is >= margin from every crop border.

    centers_global: [T, N, 2]; tiles_xywh: [T, 4] (x0, y0, cw, ch).
    """
    rel = centers_global - tiles_xywh[:, None, :2].astype(
        centers_global.dtype)
    cw = tiles_xywh[:, None, 2].astype(centers_global.dtype)
    ch = tiles_xywh[:, None, 3].astype(centers_global.dtype)
    return (
        (rel[..., 0] >= margin_px) & (rel[..., 0] <= cw - margin_px)
        & (rel[..., 1] >= margin_px) & (rel[..., 1] <= ch - margin_px)
    )


def margin_for(tile_size: int, margin_128: int = 10, margin_416: int = 20
               ) -> int:
    """`Detect_OBB.py:156-157`."""
    return margin_128 if tile_size <= 128 else margin_416


# ---------------------------------------------------------------------------
# Train-time label assignment (host/numpy, vectorized over tiles x boxes)
# ---------------------------------------------------------------------------

def assign_labels_to_tiles(
    labels_px: np.ndarray,      # [N, 9]: cls, x1..y4 in PIXELS
    grid_xy: np.ndarray,        # [T, 2] full-tile origins
    tile_size: int,
    boundary_threshold: float = 0.1,
) -> list[np.ndarray]:
    """Per-tile normalized labels, reference semantics (`Train_OBB.py:93-108`).

    Returns a list of [K_t, 9] arrays (cls, x1..y4 normalized to [0,1]),
    one per tile; empty tiles get (0, 9) arrays.
    """
    T = len(grid_xy)
    if labels_px.size == 0 or T == 0:
        return [np.zeros((0, 9), dtype=np.float64) for _ in range(T)]

    lab = np.asarray(labels_px, dtype=np.float64).reshape(-1, 9)
    xs = lab[:, 1::2]  # [N, 4]
    ys = lab[:, 2::2]
    midx = (lab[:, 1] + lab[:, 7]) / 2.0  # (x1 + x4) / 2
    midy = (lab[:, 2] + lab[:, 8]) / 2.0

    x0 = grid_xy[:, 0:1].astype(np.float64)  # [T, 1]
    y0 = grid_xy[:, 1:2].astype(np.float64)
    own = (
        (midx[None, :] >= x0) & (midx[None, :] < x0 + tile_size)
        & (midy[None, :] >= y0) & (midy[None, :] < y0 + tile_size)
    )  # [T, N]

    bx1, bx2 = xs.min(1), xs.max(1)
    by1, by2 = ys.min(1), ys.max(1)
    ax = np.maximum(
        0.0, np.minimum(bx2[None], x0 + tile_size) - np.maximum(bx1[None], x0))
    ay = np.maximum(
        0.0, np.minimum(by2[None], y0 + tile_size) - np.maximum(by1[None], y0))
    area = np.maximum(1e-6, (bx2 - bx1) * (by2 - by1))
    cov = (ax * ay) / area[None]  # [T, N]

    keep = own & (cov >= boundary_threshold)

    out = []
    for t in range(T):
        sel = lab[keep[t]]
        if len(sel) == 0:
            out.append(np.zeros((0, 9), dtype=np.float64))
            continue
        s = sel.copy()
        s[:, 1::2] = np.clip(s[:, 1::2] - grid_xy[t, 0], 0, tile_size)
        s[:, 2::2] = np.clip(s[:, 2::2] - grid_xy[t, 1], 0, tile_size)
        s[:, 1:] /= float(tile_size)
        out.append(s)
    return out
