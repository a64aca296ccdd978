"""Typed configuration system.

The reference configures everything through module-top constants edited in
source (`Train_OBB.py:19-42`, `Detect_OBB.py:23-72`) plus YOLO data yamls.
Here the same knobs are real dataclasses with YAML/CLI overrides, and the
five BASELINE.json benchmark configurations are named presets.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

# 12-entry class map (`Detect_OBB.py:44-57`, `datasets/GeoMap/data*.yaml`).
CLASS_NAMES = {
    0: "Landslide 1",
    1: "Strike",
    2: "Spring 1",
    3: "Minepit 1",
    4: "Hillside",
    5: "Feuchte",
    6: "Torf",
    7: "Bergsturz",
    8: "Landslide 2",
    9: "Spring 2",
    10: "Spring 3",
    11: "Minepit 2",
}

# BGR colors as the reference draws them (`Detect_OBB.py:59-72`).
CLASS_COLORS = {
    0: (255, 0, 0),
    1: (0, 255, 0),
    2: (0, 0, 255),
    3: (255, 255, 0),
    4: (255, 0, 255),
    5: (0, 255, 255),
    6: (0, 0, 0),
    7: (240, 34, 0),
    8: (50, 20, 60),
    9: (60, 50, 20),
    10: (200, 150, 80),
    11: (100, 200, 150),
}


@dataclass(frozen=True)
class DTEdgeConfig:
    """DT-Edge 4th-channel synthesis knobs (`Detect_OBB.py:29-32`)."""

    sigmas: tuple = (0.0, 0.6, 1.2, 2.4)
    bin_method: str = "percentile"      # "percentile" | "otsu"
    p_hi: int = 90
    p_lo: int = 65
    morph_open: int = 1
    tau: float = 3.0


@dataclass(frozen=True)
class ScaleConfig:
    """One inference scale: a tile size + overlap + model checkpoint."""

    tile_size: int
    overlap: int
    checkpoint: Optional[str] = None
    model_scale: str = "x"


@dataclass(frozen=True)
class DetectConfig:
    """Tiled multi-scale inference configuration (`Detect_OBB.py:23-72`)."""

    scales: tuple = (ScaleConfig(128, 30), ScaleConfig(416, 100))
    channels: int = 3                    # 3 or 4 (RGB + DT-Edge)
    nc: int = 12
    calculate_metrics: bool = False
    conf_thr_metrics: float = 0.001
    conf_thr_predict: float = 0.25
    engine_nms_iou: float = 0.7          # in-engine rotated NMS
    merge_iou: float = 0.4               # global/per-tile merge
    metrics_iou: float = 0.25
    map_min_score: float = 0.001
    apply_border_filter: bool = True
    margin_128: int = 10
    margin_416: int = 20
    # Engine default is 300/tile; this domain never exceeds a few dozen
    # symbols per tile (golden maps have <=34 per whole map), and the
    # per-tile exact-IoU merge is O(max_det^2) on device — 64 keeps the
    # padded NMS cheap with no observed behavioral difference. Raise to 300
    # for strict engine-cap parity experiments.
    max_det_per_tile: int = 64
    pre_topk: int = 256
    # per-map device-side compaction cap (one D2H fetch per scale); raise
    # for metrics-mode runs on dense maps if the valid count ever hits it
    max_det_per_map: int = 1024
    dt_edge: DTEdgeConfig = field(default_factory=DTEdgeConfig)
    # None = auto: pick the faster exact EDT per backend and shape
    # (banded Pallas kernel on TPU at map-scale widths; chunked-XLA brute
    # for tile-scale batches and on CPU — see ops/dtedge.default_use_pallas)
    use_pallas_edt: Optional[bool] = None
    compute_dtype: str = "bfloat16"
    # fold BatchNorm into conv kernels at detector construction (the
    # engine's fuse() before predict); applies to checkpoint-loaded
    # numpy param trees only (models/fold.py)
    fold_bn: bool = True


@dataclass(frozen=True)
class TrainConfig:
    """Training + dataset-build configuration (`Train_OBB.py:19-42`)."""

    channels: int = 3
    apply_filtered_rgb: bool = False
    need_cropping: bool = True
    need_augmentation: bool = True
    tile_size: int = 416
    overlap: int = 100
    epochs: int = 150
    batch_size: int = 16
    object_boundary_threshold: float = 0.1
    class_balance_threshold: int = 800
    augmentation_repeats: int = 2
    r_target: int = 4                    # empty:positive tile budget
    model_scale: str = "x"
    nc: int = 12
    # optimizer (per-size hyperparams, `Train_OBB.py:796-841`)
    lr0: float = 0.003
    lrf: float = 0.05
    weight_decay: float = 0.001
    momentum: float = 0.937
    warmup_epochs: float = 3.0
    warmup_momentum: float = 0.8       # momentum ramp start (-> momentum)
    warmup_bias_lr: float = 0.1        # bias-group lr ramp start (-> lr0)
    # The reference passes dropout=0.0 (`Train_OBB.py:809,834`) but the
    # engine only applies dropout to classification heads — it is inert for
    # OBB. Kept for config-surface parity; see PARITY.md.
    dropout: float = 0.0
    patience: int = 50
    # Engine dataloader knobs (`Train_OBB.py:30-32`, passed through at
    # :796-841) — kept for config-surface parity; all three are subsumed
    # by the TPU loader design rather than wired to equivalents:
    # `workers`: host dataloader threads — there is no worker pool here
    # (one fused device program per batch, gathered from a device-resident
    # tile cache, data/loader.py). `cache`: engine RAM/disk image cache —
    # strictly superseded by the device tile cache, which uploads every
    # tile ONCE (this box throttles H2D; per-batch uploads dominated epoch
    # time). `rect`: rectangular-batch collation — inert for square tiles.
    workers: int = 2
    cache: bool = False
    rect: bool = False
    # engine default: mosaic disabled for the final N epochs (ultralytics
    # close_mosaic=10, exercised via `Train_OBB.py:796-841`); runs
    # shorter than N keep mosaic on for every epoch (engine trigger
    # epoch would be negative) — see loader.mosaic_p_for_epoch
    close_mosaic: int = 10
    ema_decay: float = 0.9999
    ema_tau: float = 2000.0
    # loss gains (engine defaults)
    box_gain: float = 7.5
    cls_gain: float = 0.5
    dfl_gain: float = 1.5
    seed: int = 42
    # run-dir artifacts: results.csv/png + args.yaml + train_batch0.jpg
    # (the reference trains with plots=True, `Train_OBB.py:811,839`)
    plots: bool = True
    # parallelism
    data_axis: str = "data"
    compute_dtype: str = "bfloat16"
    # dispatch K optimizer steps per device program (scan over a
    # stacked batch group). Measured perf-NEUTRAL on this box — the
    # per-program dispatch overhead is negligible
    # (tools/profile/train_multistep.py) — kept as an opt-in for
    # environments where dispatch costs are real. 1 = one program per
    # step (always used under a multi-device mesh)
    steps_per_dispatch: int = 1


def _preset_detect(**kw) -> DetectConfig:
    return dataclasses.replace(DetectConfig(), **kw)


# The five BASELINE.json configurations as named presets.
PRESETS = {
    # Single-scale 3ch detection: best416 on tile 416 / overlap 100
    "detect_416": _preset_detect(scales=(ScaleConfig(416, 100),)),
    # Single-scale small-tile detection: best128, tile 128 / overlap 30
    "detect_128": _preset_detect(scales=(ScaleConfig(128, 30),)),
    # 4-channel RGB + DT-Edge single-scale
    "detect_416_4ch": _preset_detect(
        scales=(ScaleConfig(416, 100),), channels=4),
    # Dual-scale [128, 416] with consensus late fusion + metrics suite
    "detect_dual": _preset_detect(calculate_metrics=True),
    # Train_OBB end-to-end equivalent
    "train_416": TrainConfig(),
}


def load_overrides(cfg, overrides: dict):
    """Apply a {field: value} dict (e.g. parsed YAML/CLI) to a dataclass."""
    return dataclasses.replace(cfg, **overrides)
