"""Tiled multi-scale OBB inference pipeline.

The reference runs one ultralytics predict call per tile per scale
(~99-137 separate forward passes per golden image, `Detect_OBB.py:202-266`).
Here each scale is ONE jitted device program over the whole padded tile
batch:

    gather tiles -> (DT-Edge if 4ch) -> /255 -> bf16 forward -> decode ->
    in-engine ProbIoU NMS -> stitch to global coords -> border filter ->
    per-tile exact-IoU merge NMS -> strike angles

with fixed shapes throughout (tile count padded to power-of-two buckets,
max_det padding masks). Host code only does grid math, result compaction,
consensus fusion across scales (`fusion.py`), drawing and export.

Detection rows follow the reference 11-tuple layout:
(x1..y4 global px, cls_id, conf, angle_deg).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLASS_COLORS, CLASS_NAMES, DetectConfig, ScaleConfig
from ..models import YOLO11OBB
from ..models import decode as D
from ..ops import dtedge as DT
from ..ops import geometry as G
from ..ops import nms as NMS
from ..ops import tiling as T
from ..utils import profiling as prof
from ..utils import xlsx
from . import fusion as F

STRIKE_CLS = 1  # "Strike" (`Detect_OBB.py:45`, angle only for this class)


class Detections:
    """ultralytics-Results-like accessor over [N, 11] detection rows
    (migration aid: `results[0].obb.xyxyxyxy/.cls/.conf`,
    `Detect_OBB.py:228-231`)."""

    def __init__(self, rows: np.ndarray):
        self.rows = np.asarray(rows, np.float64).reshape(-1, 11)

    def __len__(self):
        return len(self.rows)

    def __iter__(self):
        for r in self.rows:
            yield Detections(r[None])

    @property
    def xyxyxyxy(self) -> np.ndarray:
        """[N, 4, 2] corner points."""
        return self.rows[:, :8].reshape(-1, 4, 2)

    @property
    def cls(self) -> np.ndarray:
        return self.rows[:, 8].astype(np.int64)

    @property
    def conf(self) -> np.ndarray:
        return self.rows[:, 9]

    @property
    def angle(self) -> np.ndarray:
        """Strike angle in degrees (0 for non-Strike classes)."""
        return self.rows[:, 10]

    @property
    def names(self) -> dict:
        return CLASS_NAMES


def _bucket(n: int, minimum: int = 8) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


# Device-packed detection rows are [K, 11]: x1..y4, conf, angle, META —
# cls/valid/tile_id share ONE f32 column (meta = tile_id*32 + cls*2 +
# valid; exact while tile_id < 2^18 keeps meta < 2^24, the f32 integer
# limit). The metrics-mode D2H fetch was volume-bound through the
# ~4.6 MB/s tunnel (VERDICT r03 weak #2): 13 separate f32 columns paid
# 18% more bytes than these 11 for information that packs exactly.
# Hosts unpack back to the classic 13-col float64 layout immediately
# after the fetch, so everything downstream (merge, fusion, metrics) is
# bit-identical.
PACKED_COLS = 11
META_TILE_STRIDE = 32
MAX_PACK_TILES = 1 << 18


def _to_host(x) -> np.ndarray:
    """np.asarray that also works for MULTI-PROCESS global arrays: a
    jax.Array spanning non-addressable devices (multi-host inference DP —
    every process runs the same detect call SPMD-style) is allgathered
    to every host first. Single-process arrays take the plain fast path."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _unpack_rows(flat11: np.ndarray) -> np.ndarray:
    """[K, 11] fetched device rows -> [K, 13] float64 host rows
    (x1..y4, cls, conf, angle, valid, tile_id)."""
    flat11 = _to_host(flat11)
    meta = flat11[:, 10].astype(np.int64)
    out = np.empty((flat11.shape[0], 13), np.float64)
    out[:, :8] = flat11[:, :8]
    out[:, 8] = (meta >> 1) & 15          # cls
    out[:, 9] = flat11[:, 8]              # conf
    out[:, 10] = flat11[:, 9]             # angle
    out[:, 11] = meta & 1                 # valid
    out[:, 12] = meta >> 5                # tile_id
    return out


def _meta_valid_mask(flat11: np.ndarray) -> np.ndarray:
    return (np.asarray(flat11[:, 10]).astype(np.int64) & 1).astype(bool)


class TiledDetector:
    """Multi-scale tiled detector over a set of per-scale model params.

    params_by_scale: {tile_size: flax variables dict}. Scales and thresholds
    come from `DetectConfig`.
    """

    def __init__(self, cfg: DetectConfig,
                 params_by_scale: dict[int, dict],
                 max_det: Optional[int] = None,
                 pre_topk: Optional[int] = None,
                 mesh=None):
        """`mesh`: optional jax.sharding.Mesh — the tile batch is sharded
        over its `data` axis (params replicated), scaling inference across
        chips exactly like the training DP path (SURVEY.md §2.4)."""
        sizes = [sc.tile_size for sc in cfg.scales]
        if len(set(sizes)) != len(sizes):
            raise ValueError(
                f"duplicate tile sizes in scales {sizes}: params, models "
                "and dispatches are keyed by tile size")
        if cfg.nc > META_TILE_STRIDE // 2:
            # cls shares the packed meta column with valid (bit 0) and
            # tile_id (bits >= 5): 4 bits of class id — silent corruption
            # past 16 classes, so refuse loudly (reference nc is 12)
            raise ValueError(
                f"nc={cfg.nc} exceeds the {META_TILE_STRIDE // 2}-class "
                "capacity of the packed meta column (PACKED_COLS layout); "
                "raise META_TILE_STRIDE and the _unpack_rows masks")
        self.cfg = cfg
        # shallow-copy: BN folding below replaces entries, and mutating
        # the CALLER's dict would hand folded (neutralized-BN) trees to
        # anyone reusing it for training warm-starts or a second detector
        self.params = dict(params_by_scale)
        self._folded: dict[int, bool] = {k: False for k in self.params}
        if getattr(cfg, "fold_bn", False):
            # engine fuse() parity: fold BN into conv kernels. Host
            # numpy trees only — eager device math costs one tunnel RPC
            # per op here (device-resident trees pass through unchanged).
            # Folded scales also get the FUSED graph (BatchNorm node
            # replaced by +bias): -15% device time / -30% HBM bytes on
            # the x-scale 416 program (tools/profile/bn_fold_ab.py).
            from ..models.fold import fold_bn_variables

            for k, v in list(self.params.items()):
                lv = jax.tree.leaves(v)
                if lv and all(isinstance(l, np.ndarray) for l in lv):
                    self.params[k] = fold_bn_variables(v)
                    self._folded[k] = True
        self.max_det = max_det or cfg.max_det_per_tile
        self.pre_topk = pre_topk or cfg.pre_topk
        self.mesh = mesh
        self._fetch_hints: dict = {}   # (ts, K) -> last valid-row count
        self._packed: dict = {k: None for k in params_by_scale}
        if mesh is not None:
            from ..parallel import mesh as PM

            self.params = {
                k: PM.replicate(v, mesh)
                for k, v in self.params.items()
            }
        else:
            # checkpoint params arrive as numpy; passing host arrays to
            # the jitted programs re-uploads every leaf on EVERY dispatch
            # (measured 1.9 s/rep vs 0.26 s device-resident), and even a
            # one-time per-leaf device_put is hundreds of synchronous
            # tunnel RPCs. Pack host trees into ONE flat buffer per dtype
            # and unpack in-graph (utils.runtime.pack_tree). Trees whose
            # leaves are already device arrays (fresh init) pass through.
            from ..utils.runtime import pack_tree

            self._packed = {}
            for k, v in self.params.items():
                leaves = jax.tree.leaves(v)
                if leaves and all(isinstance(l, np.ndarray)
                                  for l in leaves):
                    self._packed[k] = pack_tree(v)
                else:
                    self._packed[k] = None
        self.models = {
            sc.tile_size: YOLO11OBB(
                nc=cfg.nc, scale=sc.model_scale, in_channels=cfg.channels,
                fused_bn=self._folded.get(sc.tile_size, False))
            for sc in cfg.scales
        }
        self._fns = {}

    # ------------------------------------------------------------------
    def _packed_rows(self, n_tiles_padded: int) -> int:
        """Rows of the packed [K, 13] per-scale result. In metrics mode
        every slot is packed (mAP sweeps depend on the low-conf tail,
        conf 0.001 — no device-side compaction drop); predict mode
        compacts to a conf top-k."""
        Nd = self.max_det
        if self.cfg.calculate_metrics:
            return n_tiles_padded * Nd
        return min(max(self.cfg.max_det_per_map, n_tiles_padded * 4),
                   n_tiles_padded * Nd)

    def _scale_body(self, tile_size: int):
        """The traced per-scale compute body (unjitted):
        (params, tiles_u8, tiles_xywh, tile_valid, conf_thr) -> packed
        [K, 13] detections."""
        if ("body", tile_size) in self._fns:
            return self._fns[("body", tile_size)]

        cfg = self.cfg
        model = self.models[tile_size]
        margin = float(T.margin_for(
            tile_size, cfg.margin_128, cfg.margin_416))
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" \
            else jnp.float32

        def run(params, tiles_u8, tiles_xywh, tile_valid, conf_thr):
            x = DT.build_multich(tiles_u8, cfg.channels, cfg.dt_edge,
                                 use_pallas=cfg.use_pallas_edt)
            x = (x / 255.0).astype(dtype)
            out = model.apply(params, x)
            rbox, scores = D.decode_raw(out, tile_size)
            dets = D.postprocess_batch(
                rbox, scores, conf_thr, cfg.engine_nms_iou,
                max_det=self.max_det, pre_topk=self.pre_topk)

            c8g = T.stitch_to_global(dets["corners8"],
                                     tiles_xywh[:, :2])
            valid = dets["valid"] & tile_valid[:, None]
            if cfg.apply_border_filter and margin > 0:
                centers = G.box_center(c8g)
                valid = valid & T.border_keep_mask(
                    centers, tiles_xywh, margin)

            ang = jnp.where(dets["cls"] == STRIKE_CLS,
                            G.strike_angle(c8g), 0.0)

            # The per-tile exact-IoU merge (`Detect_OBB.py:264`) runs on
            # the HOST over the handful of surviving dets per tile (native
            # C++ double precision): a sequential greedy over <=max_det
            # tiny sets is host work; keeping it in-graph as a padded
            # O(max_det^2) clipping kernel dominated device time.
            #
            # Pack + compact to ONE [K, 11] array on device: each D2H
            # fetch costs ~35-70 ms of RPC latency through the TPU tunnel
            # (five per-field fetches of [T, max_det] arrays dominated
            # the per-scale wall time), and metrics-mode fetches are
            # additionally VOLUME-bound — cls/valid/tile_id pack exactly
            # into one f32 column (see _unpack_rows).
            T_b, Nd = valid.shape
            if T_b >= MAX_PACK_TILES:
                raise ValueError(
                    f"{T_b} tiles in one program exceeds the exact-f32 "
                    f"meta packing bound {MAX_PACK_TILES}; chunk the "
                    "image group")
            tile_id = jnp.broadcast_to(
                jnp.arange(T_b, dtype=jnp.int32)[:, None], (T_b, Nd))
            meta = (tile_id * META_TILE_STRIDE
                    + dets["cls"].astype(jnp.int32) * 2
                    + valid.astype(jnp.int32)).astype(jnp.float32)
            flat = jnp.concatenate([
                c8g.reshape(T_b * Nd, 8).astype(jnp.float32),
                dets["conf"].reshape(-1, 1).astype(jnp.float32),
                ang.reshape(-1, 1).astype(jnp.float32),
                meta.reshape(-1, 1),
            ], axis=1)                                    # [T*Nd, 11]
            k = self._packed_rows(T_b)
            key = jnp.where(valid.reshape(-1), dets["conf"].reshape(-1),
                            -1.0)
            _, top = jax.lax.top_k(key, k)
            return flat[top]

        self._fns[("body", tile_size)] = run
        return run

    def _tile_fn(self, tile_size: int):
        """Jitted whole-batch program over an already-extracted tile
        batch (the mesh-sharded path uses this so the tile batch can be
        device_put with a data-axis sharding first)."""
        key = ("jit", tile_size)
        if key not in self._fns:
            self._fns[key] = jax.jit(self._scale_body(tile_size))
        return self._fns[key]

    def _tile_fn_fused(self, tile_size: int, overlap: int, shapes: tuple,
                       segments: tuple, grids_np: np.ndarray,
                       valid_np: np.ndarray):
        """Jitted program that FUSES tile extraction with the scale body:
        takes only the raw device images (+ conf scalar) and gathers the
        tile batch in-graph — one dispatch per scale with no intermediate
        eager gather programs or extra HBM round trip. The tile grid and
        validity mask are fully determined by (image shapes, ts, overlap),
        so they are EMBEDDED as program constants: shipping them as
        arguments cost ~4 small synchronous H2D RPCs (~30 ms each through
        the tunnel) per detect call. Compiled per (scale, overlap,
        image-shape-set); the persistent compilation cache makes repeats
        cheap.

        When the scale's params are packed flat buffers (checkpoint
        loads), the param tree is rebuilt in-graph (`unpack_tree`) — the
        slices fuse into their first use."""
        packed = self._packed.get(tile_size)
        key = ("fused", tile_size, overlap, shapes, segments,
               packed is not None)
        if key in self._fns:
            return self._fns[key]
        body = self._scale_body(tile_size)
        spec = packed[1] if packed is not None else None
        grids_c = np.asarray(grids_np)
        valid_c = np.asarray(valid_np)

        @jax.jit
        def run(params, images, conf_thr):
            if spec is not None:
                from ..utils.runtime import unpack_tree

                params = unpack_tree(params, spec)
            grids = jnp.asarray(grids_c)     # trace-time constants
            valid = jnp.asarray(valid_c)
            parts = [
                T.extract_tiles(images[i], grids[o:o + tb, :2], tile_size)
                for i, (o, tcount, tb) in enumerate(segments)
            ]
            tiles = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
            return body(params, tiles, grids, valid, conf_thr)

        self._fns[key] = run
        return run

    def _conf_scalar(self, value: float):
        """Cached device scalar: a fresh jnp.float32 per call is one more
        synchronous H2D RPC through the tunnel."""
        if not hasattr(self, "_conf_cache"):
            from collections import OrderedDict

            self._conf_cache = OrderedDict()
        if value not in self._conf_cache:
            self._conf_cache[value] = jnp.float32(value)
            while len(self._conf_cache) > 32:   # bounded (VERDICT r03 #6)
                self._conf_cache.popitem(last=False)
        else:
            self._conf_cache.move_to_end(value)   # LRU, not FIFO
        return self._conf_cache[value]

    def _params_arg(self, tile_size: int):
        """What the fused program receives as `params`: the packed flat
        buffers when the scale came from a checkpoint, else the device
        param tree."""
        packed = self._packed.get(tile_size)
        return packed[0] if packed is not None else self.params[tile_size]

    # NOTE: an experiment merging EVERY scale into one jitted program
    # (single dispatch + fetch) REGRESSED golden throughput ~2x (fetch
    # 367 ms vs 191 ms): XLA executes the merged graph strictly
    # sequentially and its layout/scheduling choices worsen across the
    # concatenated scale bodies. Per-scale programs with one joined
    # device-side concat + single D2H fetch are the fast configuration.

    # ------------------------------------------------------------------
    def _grids(self, shapes, scale: ScaleConfig):
        """Host-side tile grids for one scale over an image-shape list:
        (grids [sum tb, 4] int32, valid [sum tb] bool,
        segments [(start, tcount, tb)])."""
        ts = scale.tile_size
        n_shards = (self.mesh.shape.get("data", 1)
                    if self.mesh is not None else 1)
        grid_parts, valid_parts, segments = [], [], []
        offset = 0
        for shape in shapes:
            h, w = shape[:2]
            grid = T.inference_tile_grid(h, w, ts, scale.overlap)
            tcount = len(grid)
            tb = max(_bucket(tcount), n_shards)
            grid_p = np.zeros((tb, 4), np.int32)
            grid_p[:tcount] = grid
            tile_valid = np.zeros((tb,), bool)
            tile_valid[:tcount] = True
            grid_parts.append(grid_p)
            valid_parts.append(tile_valid)
            segments.append((offset, tcount, tb))
            offset += tb
        return (np.concatenate(grid_parts), np.concatenate(valid_parts),
                segments)

    def _conf_thr(self) -> float:
        return (self.cfg.conf_thr_metrics if self.cfg.calculate_metrics
                else self.cfg.conf_thr_predict)

    def _dispatch_scale(self, image_bgr: np.ndarray, scale: ScaleConfig):
        """Launch the jitted per-scale program asynchronously; returns the
        device array ([K, 13] packed dets) for later collection."""
        packed, _ = self._dispatch_scale_multi([image_bgr], scale)
        return packed

    def _dispatch_scale_multi(self, images_bgr: list, scale: ScaleConfig):
        """One device program covering the tile batches of SEVERAL images
        at this scale (concatenated with per-image bucket segments).
        Returns (packed dets [K, 13], segments [(start, tcount, tb)])."""
        ts = scale.tile_size
        grids, valid, segments = self._grids(
            tuple(img.shape for img in images_bgr), scale)
        conf_thr = self._conf_thr()

        if self.mesh is None:
            # jnp.asarray on an already-device array is a no-op, so
            # callers pre-transfer each image ONCE and share it across
            # scales (H2D through the tunnel is expensive; see CLAUDE.md).
            # Tile extraction runs IN-GRAPH (fused program, grid baked as
            # constants) — no eager gather dispatches, no per-call grid
            # transfers, no intermediate tile buffer round trip.
            images_dev = tuple(jnp.asarray(img) for img in images_bgr)
            run = self._tile_fn_fused(
                ts, scale.overlap, tuple(im.shape for im in images_dev),
                tuple(segments), grids, valid)
            packed = run(self._params_arg(ts), images_dev,
                         self._conf_scalar(conf_thr))
            return packed, segments

        # mesh path: extract first so the tile batch can be device_put
        # with the data-axis sharding (inference DP across chips)
        from ..parallel import mesh as PM

        tile_parts = [
            T.extract_tiles(jnp.asarray(img),
                            jnp.asarray(grids[o:o + tb, :2]), ts)
            for img, (o, tcount, tb) in zip(images_bgr, segments)
        ]
        tiles = (tile_parts[0] if len(tile_parts) == 1
                 else jnp.concatenate(tile_parts))
        sh = PM.batch_sharding(self.mesh)
        tiles = jax.device_put(tiles, sh)
        grid_j = jax.device_put(jnp.asarray(grids), sh)
        valid_j = jax.device_put(jnp.asarray(valid), sh)
        run = self._tile_fn(ts)
        packed = run(self.params[ts], tiles, grid_j, valid_j,
                     jnp.float32(conf_thr))
        return packed, segments

    @staticmethod
    def _merge_collected(flat: np.ndarray, merge_iou: float) -> np.ndarray:
        """Host-side per-tile exact-IoU merge (`Detect_OBB.py:264`) over
        already-fetched valid rows [N, 13], preserving tile scan order and
        conf-desc order within tiles."""
        if not len(flat):
            return np.zeros((0, F.DET_WIDTH), np.float64)
        order = np.lexsort((-flat[:, 9], flat[:, 12]))
        flat = flat[order]
        from ..utils import native

        # one native call runs every tile's greedy merge (a Python loop
        # over ~2k tile groups cost ~0.5 s/map on the detect_stream
        # critical path); rows are (tile asc, conf desc) so groups are
        # contiguous and already conf-ordered
        keep = native.greedy_nms_grouped(
            np.ascontiguousarray(flat[:, :11]),
            flat[:, 12].astype(np.int32), merge_iou)
        if keep is not None:
            return np.ascontiguousarray(flat[keep][:, :11])
        # fallback: contiguous-slice per-tile merge (device IoU path)
        _, starts = np.unique(flat[:, 12], return_index=True)
        bounds = np.append(starts, len(flat))
        rows = [F.merge_detections(flat[bounds[k]:bounds[k + 1], :11],
                                   merge_iou)
                for k in range(len(starts))]
        return (np.concatenate(rows) if rows
                else np.zeros((0, F.DET_WIDTH), np.float64))

    def _check_cap(self, flat: np.ndarray) -> None:
        """Warn when the per-map compaction cap MAY have bound: every
        packed row valid means either conf-ranked rows below the cap were
        dropped on device, or the valid count landed exactly on the cap
        with nothing lost — the packed result cannot distinguish the two
        (predict mode only; metrics mode packs all slots)."""
        if (not self.cfg.calculate_metrics and len(flat)
                and bool((flat[:, 11] > 0.5).all())):
            import warnings

            warnings.warn(
                f"per-map detection cap may have bound (all {len(flat)} "
                "packed rows valid): low-confidence detections MAY have "
                "been dropped on device — or the count landed exactly on "
                "the cap. Raise DetectConfig.max_det_per_map to be sure.",
                RuntimeWarning)

    def _collect_scale(self, packed, merge_iou: float) -> np.ndarray:
        """One D2H fetch + host merge."""
        flat = _unpack_rows(_to_host(packed))        # single fetch
        self._check_cap(flat)
        return self._merge_collected(flat[flat[:, 11] > 0.5], merge_iou)

    def detect_scale(self, image_bgr: np.ndarray, scale: ScaleConfig
                     ) -> np.ndarray:
        """All detections for one scale as [N, 11] rows, in the reference's
        order (tile scan order, conf-descending within each tile)."""
        return self._collect_scale(
            self._dispatch_scale(image_bgr, scale), self.cfg.merge_iou)

    # ------------------------------------------------------------------
    # prefix fetches below this total packed size don't pay for their
    # extra RPC round-trips (each ~35-70 ms; D2H ~4.6 MB/s measured)
    SPLIT_FETCH_MIN_BYTES = 2 * 1024 * 1024

    def _dispatch_group(self, images_dev: list):
        """Dispatch every scale's program over a group of device-resident
        images, and enqueue the joining/prefix-slice device ops NOW — a
        device op enqueued later (i.e. after the next chunk's H2D) would
        wait for that transfer (put->compute rule, see detect_stream) and
        break the pipeline. Returns (fetch_fn, n_images); fetch_fn() ->
        (flat_all float64, order [(ts, n_rows, segments)])."""
        with prof.timed("detect/dispatch"):
            pending = {
                sc.tile_size: self._dispatch_scale_multi(images_dev, sc)
                for sc in self.cfg.scales
            }
            total_rows = sum(p.shape[0] for p, _ in pending.values())
            if total_rows * PACKED_COLS * 4 < self.SPLIT_FETCH_MIN_BYTES:
                # small result: one joined D2H, RPC-latency-bound — keep
                # the single-fetch configuration (golden workload)
                order = [(ts, packed.shape[0], segments)
                         for ts, (packed, segments) in pending.items()]
                arrays = [p for _, (p, _) in pending.items()]
                joined = arrays[0] if len(arrays) == 1 \
                    else jnp.concatenate(arrays)

                def fetch():
                    with prof.timed("detect/fetch"):
                        return _unpack_rows(_to_host(joined)), order
                return fetch, len(images_dev)

            # large result (metrics mode packs EVERY per-tile slot so the
            # mAP low-conf tail survives — most rows are invalid padding,
            # and dataset-scale fetch was D2H-volume-bound at ~4.6 MB/s
            # through the tunnel): rows are sorted valid-first on device,
            # so fetch only an adaptive valid prefix per scale — JOINED
            # across scales into ONE RPC (each fetch costs ~35-70 ms of
            # latency on top of its bytes); per-scale doubling only on
            # the rare saturation of a prefix.
            handles = []
            pres = []
            for ts, (packed, segments) in pending.items():
                K = packed.shape[0]
                hint = self._fetch_hints.get((ts, K), K)
                # +1: a pow2-exact valid count would otherwise saturate
                # its own bucket and force a second fetch every time
                k = min(K, _bucket(max(hint + 1, 64)))
                pre = packed if k >= K else packed[:k]
                handles.append((ts, packed, k, K, segments))
                pres.append(pre)
            joined_pre = pres[0] if len(pres) == 1 \
                else jnp.concatenate(pres)

        def fetch():
            with prof.timed("detect/fetch"):
                pre_all = _to_host(joined_pre)         # ONE D2H RPC
                order, parts = [], []
                off = 0
                for ts, packed, k, K, segments in handles:
                    flat = self._finish_valid_prefix(
                        packed, pre_all[off:off + k], K, ts)
                    off += k
                    order.append((ts, len(flat), segments))
                    parts.append(flat)
                flat_all = parts[0] if len(parts) == 1 \
                    else np.concatenate(parts)
                return flat_all, order
        return fetch, len(images_dev)

    def _finish_valid_prefix(self, packed, pre_host, K: int,
                             ts: int) -> np.ndarray:
        """Adaptive valid-prefix D2H of one scale's packed [K, 11] rows.

        `pre_host` is this scale's slice of the already-fetched joined
        power-of-two prefix (sized by the previous call's valid count).
        Double while saturated (every fetched row still valid — the
        doubling slices are enqueued late and may wait behind a
        pipelined upload, but saturation is rare once the hint has
        settled). Returns UNPACKED [n, 13] float64 rows; identical to a
        full fetch because only invalid rows are skipped."""
        parts = [_to_host(pre_host)]
        got = parts[0].shape[0]
        while got < K and _meta_valid_mask(parts[-1]).all():
            k = min(K, got * 2)
            parts.append(_to_host(packed[got:k]))
            got = k
        flat = _unpack_rows(parts[0] if len(parts) == 1
                            else np.concatenate(parts))
        self._fetch_hints[(ts, K)] = int((flat[:, 11] > 0.5).sum())
        return flat

    def detect_images(self, images_bgr: list):
        """Batched multi-image detection: ONE device program per scale
        covers every image's tile batch (in-graph extraction over the
        shared device-resident images), and ALL scales' packed results
        are pulled in ONE D2H fetch (each fetch costs ~35-70 ms of tunnel
        RPC latency) — or an adaptive valid-prefix fetch when the pack is
        large (metrics mode at dataset scale). Returns a list of
        per-image result dicts (same shape as `detect_image`)."""
        with prof.timed("detect/h2d"):
            # one H2D per image, shared by every scale's extraction
            images_dev = [jnp.asarray(im) for im in images_bgr]
        fetch, n = self._dispatch_group(images_dev)
        flat_all, order = fetch()
        return self._split_and_finalize(flat_all, order, n)

    def detect_stream(self, images_bgr, chunk: int = 1):
        """Pipelined multi-map detection (generator of per-image result
        dicts, same shape as `detect_image`), `chunk` images per device
        program group.

        `detect_images` uploads every image FIRST, then dispatches — on
        this box's permanently throttled ~35 MB/s H2D link a 4096^2 map
        costs ~1.4 s of upload serial with ~0.7 s of compute+fetch. The
        tunnel overlaps an H2D transfer with compute/D2H *enqueued
        before it*, but a program enqueued AFTER a pending transfer
        waits for the transfer (measured: tools/profile/h2d_overlap.py —
        compute->put 1.76 s ≈ max, put->compute 2.86 s ≈ serial+). So
        the pipeline order per chunk k is:

            dispatch k's per-scale programs + join/prefix-slice ops
            -> enqueue chunk k+1's H2D (hides under k's compute + fetch)
            -> D2H fetch of k -> dispatch k+1 -> host merge/fusion of k
               (overlaps k+1's device compute) -> yield k's results

        Steady-state wall per chunk = max(H2D, compute + fetch + host)
        instead of their sum. Results are identical to `detect_images`
        per image (a chunk-shape change only costs the usual per-shape
        compile)."""
        images_bgr = list(images_bgr)
        if not images_bgr:
            return
        chunk = max(1, chunk)
        groups = [images_bgr[i:i + chunk]
                  for i in range(0, len(images_bgr), chunk)]

        def put(group):
            with prof.timed("detect/h2d"):
                return [im if isinstance(im, jax.Array)
                        else jax.device_put(np.asarray(im))
                        for im in group]

        cur = self._dispatch_group(put(groups[0]))
        for nxt in groups[1:]:
            nxt_dev = put(nxt)
            fetch, n = cur
            flat_all, order = fetch()
            cur = self._dispatch_group(nxt_dev)
            yield from self._split_and_finalize(flat_all, order, n)
        fetch, n = cur
        flat_all, order = fetch()
        yield from self._split_and_finalize(flat_all, order, n)

    def _split_and_finalize(self, flat_all, order, n_images: int):
        """Split the single fetched packed array into per-scale/per-image
        det sets, run the host merges and the consensus fusion. `order`
        entries are (ts, n_rows, segments), consecutive in flat_all."""
        per_image: list[dict] = [dict() for _ in range(n_images)]
        offset_rows = 0
        for ts, n_rows, segments in order:
            flat = flat_all[offset_rows:offset_rows + n_rows]
            offset_rows += n_rows
            self._check_cap(flat)
            flat = flat[flat[:, 11] > 0.5]
            with prof.timed(f"detect/merge_{ts}"):
                for i, (start, tcount, tb) in enumerate(segments):
                    sel = (flat[:, 12] >= start) & (
                        flat[:, 12] < start + tb)
                    sub = flat[sel].copy()
                    sub[:, 12] -= start
                    per_image[i][ts] = self._merge_collected(
                        sub, self.cfg.merge_iou)
        with prof.timed("detect/fusion"):
            return [self._finalize(d) for d in per_image]

    def _finalize(self, dets_by_scale: dict) -> dict:
        result = {"by_scale": dets_by_scale}
        if self.cfg.calculate_metrics:
            union = (np.concatenate(list(dets_by_scale.values()))
                     if dets_by_scale else np.zeros((0, F.DET_WIDTH)))
            result["merged_for_map"] = F.merge_detections(
                union, self.cfg.merge_iou)
        consensus = F.cross_scale_consensus_filter(dets_by_scale)
        result["merged_for_pr"] = F.merge_detections(
            consensus, self.cfg.merge_iou)
        return result

    def detect_image(self, image_bgr: np.ndarray):
        """Full multi-scale detection: returns dict with per-scale dets,
        consensus+merged dets (`merged_for_pr`) and, under
        calculate_metrics, the wide pre-consensus union (`merged_for_map`)
        — mirroring `process_image` (`Detect_OBB.py:268-345`)."""
        return self.detect_images([image_bgr])[0]

    # ------------------------------------------------------------------
    # ultralytics-Results-style surface (migration aids)
    # ------------------------------------------------------------------
    def predict(self, image_bgr: np.ndarray) -> Detections:
        """Full tiled multi-scale detection with the ultralytics-Results
        accessor surface: `det.predict(img).xyxyxyxy/.cls/.conf/.angle`
        over the consensus+merged set (`Detect_OBB.py:228-231` shape)."""
        return Detections(self.detect_image(image_bgr)["merged_for_pr"])

    def predict_crop(self, crop_bgr: np.ndarray,
                     tile_size: Optional[int] = None) -> Detections:
        """Single-crop predictor, the reference's `run_inference_on_crop`
        (`Detect_OBB.py:76-85`): DT-Edge multichannel build on the raw
        crop, ultralytics-style letterbox to the model size
        (`ops/image.py::letterbox` — aspect-preserving resize + 114 pad),
        one forward + decode + rotated NMS, and corners mapped back to
        CROP pixel coords via (x - pad) / ratio. No tiling, no border
        filter, no merge — the raw per-crop result the engine's
        `model(net_input)` returns.

        COMPILE COST: the DT-Edge channel runs on the RAW crop before
        letterboxing (reference semantics, `Detect_OBB.py:77-85`), so
        the program shape depends on the crop shape — each DISTINCT crop
        shape compiles its own program (~20-90 s through this box's
        remote-compile tunnel, then cached persistently). Feed
        fixed-size crops when calling this in a loop; the per-shape
        program cache is LRU-bounded to the last 8 shapes."""
        from collections import OrderedDict

        from ..ops import image as IM

        ts = tile_size or self.cfg.scales[0].tile_size
        if ts not in self.models:
            raise ValueError(f"no model for tile size {ts}; have "
                             f"{sorted(self.models)}")
        conf_thr = self._conf_thr()
        if not hasattr(self, "_crop_fns"):
            self._crop_fns: OrderedDict = OrderedDict()
        key = (ts, crop_bgr.shape, self._packed.get(ts) is not None)
        if key in self._crop_fns:
            self._crop_fns.move_to_end(key)
        else:
            cfg = self.cfg
            model = self.models[ts]
            packed = self._packed.get(ts)
            spec = packed[1] if packed is not None else None
            dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" \
                else jnp.float32

            @jax.jit
            def run(params, img_u8, thr):
                if spec is not None:
                    from ..utils.runtime import unpack_tree

                    params = unpack_tree(params, spec)
                mc = DT.build_multich(img_u8[None], cfg.channels,
                                      cfg.dt_edge,
                                      use_pallas=cfg.use_pallas_edt)[0]
                x, ratio, (dw, dh) = IM.letterbox(mc, ts)
                x = (x[None] / 255.0).astype(dtype)
                out = model.apply(params, x)
                rbox, scores = D.decode_raw(out, ts)
                dets = D.postprocess_batch(
                    rbox, scores, thr, cfg.engine_nms_iou,
                    max_det=self.max_det, pre_topk=self.pre_topk)
                c8 = dets["corners8"][0]                      # [Nd, 8]
                pad = jnp.asarray([dw, dh] * 4, jnp.float32)
                c8 = (c8 - pad) / ratio
                ang = jnp.where(dets["cls"][0] == STRIKE_CLS,
                                G.strike_angle(c8), 0.0)
                return jnp.concatenate([
                    c8,
                    dets["cls"][0][:, None].astype(jnp.float32),
                    dets["conf"][0][:, None].astype(jnp.float32),
                    ang[:, None],
                    dets["valid"][0][:, None].astype(jnp.float32),
                ], axis=1)                                    # [Nd, 12]

            self._crop_fns[key] = run
            while len(self._crop_fns) > 8:
                self._crop_fns.popitem(last=False)
        packed = self._crop_fns[key](
            self._params_arg(ts), jnp.asarray(crop_bgr),
            self._conf_scalar(conf_thr))
        flat = _to_host(packed).astype(np.float64)
        return Detections(flat[flat[:, 11] > 0.5][:, :11])


# ---------------------------------------------------------------------------
# Rendering + export (host I/O boundary, matches reference artifacts)
# ---------------------------------------------------------------------------

def draw_detections(image_bgr: np.ndarray, dets: np.ndarray) -> np.ndarray:
    """Annotated copy: polylines + 'label conf' text (`Detect_OBB.py:304-316`)."""
    import cv2

    out = image_bgr.copy()
    H, W = out.shape[:2]
    for row in dets:
        x1, y1, x2, y2, x3, y3, x4, y4, cls_id, conf = row[:10]
        cls_id = int(cls_id)
        color = tuple(int(c) for c in CLASS_COLORS.get(cls_id, (0, 255, 255)))
        label = CLASS_NAMES.get(cls_id, f"Class{cls_id}")
        pts = np.array([[x1, y1], [x2, y2], [x3, y3], [x4, y4]], np.int32)
        cv2.polylines(out, [pts], isClosed=True, color=color, thickness=2)
        tx = int(max(0, min(W - 1, round(min(x1, x2, x3, x4)))))
        ty = int(max(0, min(H - 1, round(min(y1, y2, y3, y4) - 10))))
        cv2.putText(out, f"{label} {conf:.2f}", (tx, ty),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 2,
                    lineType=cv2.LINE_AA)
    return out


XLSX_HEADER = ["Class", "X1", "Y1", "X2", "Y2", "X3", "Y3", "X4", "Y4",
               "Confidence", "Angle"]


def export_xlsx(path: str, dets: np.ndarray) -> None:
    """11-column schema export (`Detect_OBB.py:326-330`)."""
    rows = []
    for r in dets:
        cls_id = int(r[8])
        rows.append([CLASS_NAMES.get(cls_id, f"Class{cls_id}")]
                    + [float(v) for v in r[:8]]
                    + [float(r[9]), float(r[10])])
    xlsx.write_xlsx(path, rows, header=XLSX_HEADER)


def process_image(detector: TiledDetector, image_path: str, output_dir: str,
                  store: Optional[dict] = None) -> dict:
    """Detect + render + export one image; mirrors `process_image`
    (`Detect_OBB.py:268-345`) incl. the _detected.jpg / .xlsx naming."""
    import cv2

    t0 = time.time()
    image = cv2.imread(image_path)
    if image is None:
        print(f"[Warn] Could not read image: {image_path}")
        return {}

    result = detector.detect_image(image)
    merged = result["merged_for_pr"]
    elapsed = time.time() - t0
    print(f"--- {elapsed:.3f} seconds ---")

    name = os.path.basename(image_path)
    stem = os.path.splitext(name)[0]
    os.makedirs(output_dir, exist_ok=True)
    cv2.imwrite(os.path.join(output_dir, f"{stem}_detected.jpg"),
                draw_detections(image, merged))
    export_xlsx(os.path.join(output_dir, f"{stem}.xlsx"), merged)

    if store is not None:
        store.setdefault("pr", {})[image_path] = merged
        if "merged_for_map" in result:
            store.setdefault("map", {})[image_path] = result[
                "merged_for_map"]
    result["seconds"] = elapsed
    return result
