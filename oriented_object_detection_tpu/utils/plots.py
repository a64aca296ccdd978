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
