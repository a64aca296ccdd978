"""Training artifacts: results.csv + curve plots.

The reference trains with `plots=True` (`Train_OBB.py:811, 839`), which
makes the engine write per-epoch results tables and curve images into the
run directory. Equivalent here: `ResultsWriter` appends one row per epoch
to results.csv and renders results.png (loss components + fitness curves)
when matplotlib is available.
"""

from __future__ import annotations

import csv
import os


class ResultsWriter:
    FIELDS = ["epoch", "loss", "box", "cls", "dfl", "fitness", "lr"]

    def __init__(self, run_dir: str, plots: bool = True):
        self.run_dir = run_dir
        self.plots = plots
        self.rows: list[dict] = []
        os.makedirs(run_dir, exist_ok=True)
        self.csv_path = os.path.join(run_dir, "results.csv")

    def append(self, **kw):
        row = {k: kw.get(k, "") for k in self.FIELDS}
        self.rows.append(row)
        write_header = not os.path.exists(self.csv_path)
        with open(self.csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self.FIELDS)
            if write_header:
                w.writeheader()
            w.writerow(row)
        if self.plots:
            self._plot()

    def _plot(self):
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        if len(self.rows) < 2:
            return
        ep = [r["epoch"] for r in self.rows]
        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        for key in ("box", "cls", "dfl"):
            vals = [float(r[key]) for r in self.rows if r[key] != ""]
            if vals:
                axes[0].plot(ep[: len(vals)], vals, label=key)
        axes[0].set_xlabel("epoch")
        axes[0].set_title("train losses")
        axes[0].legend()
        fit = [float(r["fitness"]) for r in self.rows if r["fitness"] != ""]
        if fit:
            axes[1].plot(ep[: len(fit)], fit)
        axes[1].set_xlabel("epoch")
        axes[1].set_title("fitness (0.1*mAP50 + 0.9*mAP50-95)")
        fig.tight_layout()
        fig.savefig(os.path.join(self.run_dir, "results.png"), dpi=100)
        plt.close(fig)


def write_args_yaml(run_dir: str, cfg) -> None:
    """The engine dumps the resolved train arguments as `args.yaml` into
    the run directory (ultralytics trainer setup, exercised via
    `Train_OBB.py:796-841`); same artifact here from the TrainConfig."""
    import dataclasses

    try:
        import yaml
    except Exception:
        return
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "args.yaml"), "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f, sort_keys=True)


def _xywhr_corners_np(b):
    import numpy as np

    cx, cy, w, h, r = [float(v) for v in b]
    c, s = np.cos(r), np.sin(r)
    out = []
    for dx, dy in ((w / 2, h / 2), (-w / 2, h / 2),
                   (-w / 2, -h / 2), (w / 2, -h / 2)):
        out.append((cx + dx * c - dy * s, cy + dx * s + dy * c))
    return np.asarray(out, np.float64)


def plot_train_batch(batch_host: dict, path: str,
                     max_tiles: int = 16) -> None:
    """`train_batch0.jpg` analogue (the engine writes augmented-batch
    mosaics with `plots=True`): a grid of the first tiles with their
    rotated GT boxes drawn. Host-side; silently skipped without cv2.
    Never raises — a cosmetic artifact must not kill a training run."""
    try:
        _plot_train_batch(batch_host, path, max_tiles)
    except Exception as e:  # warn-and-continue (engine plots semantics)
        print(f"[Plots] train_batch plot failed (continuing): {e}")


def _plot_train_batch(batch_host: dict, path: str,
                      max_tiles: int = 16) -> None:
    import numpy as np

    try:
        import cv2
    except Exception:
        return
    imgs = np.asarray(batch_host["images"], np.float32)
    boxes = np.asarray(batch_host["gt_xywhr"], np.float32)
    mask = np.asarray(batch_host["gt_mask"], bool)
    n = min(max_tiles, imgs.shape[0])
    side = int(np.ceil(np.sqrt(n)))
    ts = imgs.shape[1]
    canvas = np.zeros((side * ts, side * ts, 3), np.uint8)
    for k in range(n):
        tile = imgs[k]
        if tile.max() <= 1.5:            # loader feeds [0, 1] floats
            tile = tile * 255.0
        # ascontiguousarray is REQUIRED: np.asarray of a TPU-tunnel
        # device array is non-contiguous, and clip/astype preserve the
        # layout (order 'K') — cv2 5.0 rejects non-contiguous images
        tile = np.ascontiguousarray(
            np.clip(tile[..., :3], 0, 255).astype(np.uint8))
        for b, m in zip(boxes[k], mask[k]):
            if not m:
                continue
            pts = _xywhr_corners_np(b).round().astype(np.int32)
            cv2.polylines(tile, [pts.reshape(-1, 1, 2)], True,
                          (0, 255, 0), 1)
        r, c = divmod(k, side)
        canvas[r * ts:(r + 1) * ts, c * ts:(c + 1) * ts] = tile
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, canvas)
