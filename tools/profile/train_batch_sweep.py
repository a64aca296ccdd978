"""Train-step throughput vs batch size (VERDICT r03 weak #5).

The r03 point was x-416-b16 at 59 ms/step (~33% MFU) with a ~24 ms
program-context gap that multi-step dispatch could not remove. The
metric that matters is imgs/sec, so sweep the batch size: the fixed
per-program cost amortizes with B and the MXU tiles better on larger
batches.

Timing method (CLAUDE.md): block_until_ready only acks enqueue through
this tunnel, so each point is (median wall of K chained steps + one
metrics fetch) minus (median wall of 1 step + fetch), over (K-1). State
feeds each next step, so the chain cannot be collapsed by XLA; inputs
per step are the same batch (the honest per-step python-loop number —
the r03 bogus-CSE case was a scan with a REUSED traced slice, not this).

Usage: python tools/profile/train_batch_sweep.py \
          [--points x:416:16,x:416:32,x:416:64,n:416:64,n:416:128]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def measure(scale: str, ts: int, B: int, reps: int = 5, K: int = 6):
    import jax
    import jax.numpy as jnp

    from oriented_object_detection_tpu.config import TrainConfig
    from oriented_object_detection_tpu.train import trainer as TR
    from oriented_object_detection_tpu.train.loss import LossConfig

    cfg = TrainConfig(tile_size=ts, model_scale=scale, channels=3,
                      batch_size=B)
    model, state, tx = TR.create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100)
    step_fn = TR.make_train_step(model, tx, cfg, LossConfig(img_size=ts))
    rng = np.random.RandomState(0)
    M = 16
    boxes = np.zeros((B, M, 5), np.float32)
    mask = np.zeros((B, M), bool)
    boxes[:, 0] = [100, 100, 30, 20, 0.3]
    mask[:, 0] = True
    batch = {
        "images": jnp.asarray(rng.rand(B, ts, ts, 3), jnp.float32),
        "gt_labels": jnp.zeros((B, M), jnp.int32),
        "gt_xywhr": jnp.asarray(boxes),
        "gt_mask": jnp.asarray(mask),
    }

    def run(k):
        nonlocal state
        t0 = time.time()
        m = None
        for _ in range(k):
            state, m = step_fn(state, batch)
        np.asarray(m)              # real execution barrier (D2H)
        return time.time() - t0

    run(1)                         # compile + settle
    t1 = np.median([run(1) for _ in range(reps)])
    tk = np.median([run(K) for _ in range(reps)])
    step_ms = max((tk - t1) / (K - 1) * 1000.0, 1e-3)
    return step_ms, B / (step_ms / 1000.0)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--points",
                    default="x:416:16,x:416:32,x:416:64,n:416:64,"
                            "n:416:128")
    args = ap.parse_args(argv)

    from oriented_object_detection_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()

    out = []
    for spec in args.points.split(","):
        scale, ts, B = spec.split(":")
        try:
            ms, ips = measure(scale, int(ts), int(B))
            row = {"scale": scale, "tile": int(ts), "batch": int(B),
                   "step_ms": round(ms, 1), "imgs_per_sec": round(ips, 1)}
        except Exception as e:  # OOM etc: record, keep sweeping
            row = {"scale": scale, "tile": int(ts), "batch": int(B),
                   "error": f"{type(e).__name__}: {str(e)[:200]}"}
        out.append(row)
        print(json.dumps(row), flush=True)
    best = max((r for r in out if "imgs_per_sec" in r),
               key=lambda r: r["imgs_per_sec"], default=None)
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
