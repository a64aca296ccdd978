"""Distill a training checkpoint into a compact committed bench asset.

`runs/` is gitignored and periodically cleaned between driver sessions,
which silently downgraded bench.py's headline metric from the
trained-checkpoint configuration (the only one where merge/consensus/
fusion do real work, VERDICT r02 #4) to the random+density fallback.
This tool strips a best.ckpt down to inference essentials — EMA weights
cast to float16 plus batch_stats and the arch metadata — so the result
is small enough to commit under assets/bench_ckpts/, where bench.py
falls back when runs/obb/train{ts}/best.ckpt is absent.

Usage:
  python tools/distill_bench_ckpt.py runs/e2e_synth/run128/best.ckpt \
      assets/bench_ckpts/train128.ckpt
"""

from __future__ import annotations

import os
import pickle
import sys

import numpy as np

sys.path.insert(0, ".")


def distill(src: str, dst: str) -> dict:
    with open(src, "rb") as f:
        ck = pickle.load(f)
    params = ck["ema_params"] if ck.get("ema_params") is not None \
        else ck["params"]

    def to_f16(leaf):
        a = np.asarray(leaf)
        return a.astype(np.float16) if a.dtype == np.float32 else a

    import jax

    payload = {
        "step": int(ck.get("step", 0)),
        # EMA weights become THE params; bench/inference never needs the
        # raw (non-EMA) training params or the SGD momentum buffers
        "params": jax.tree.map(to_f16, params),
        "batch_stats": ck["batch_stats"],  # small; keep fp32 (BN var)
        "ema_params": None,
        "extra": {**ck.get("extra", {}), "distilled_fp16": True},
    }
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    with open(dst, "wb") as f:
        pickle.dump(payload, f)
    return payload


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print(__doc__)
        raise SystemExit(2)
    src, dst = argv
    payload = distill(src, dst)
    n = sum(np.asarray(x).size
            for x in __import__("jax").tree.leaves(payload["params"]))
    print(f"[distill] {src} -> {dst}: {n:,} params, "
          f"{os.path.getsize(dst) / 1e6:.1f} MB, "
          f"extra={payload['extra']}")


if __name__ == "__main__":
    main()
