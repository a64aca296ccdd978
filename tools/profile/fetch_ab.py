"""Same-process A/B of the adaptive valid-prefix fetch vs the single
full-pack fetch (the tunnel's D2H rate varies ~2x day to day, so only
interleaved same-run comparisons mean anything — CLAUDE.md).

Runs dataset-scale chunks (10 maps of 1000^2, metrics mode) through
detect_images with SPLIT_FETCH_MIN_BYTES toggled, interleaved A/B/A/B,
and prints per-mode fetch + wall medians and the rows fetched.

Usage: python tools/profile/fetch_ab.py [--chunks 4] [--chunk 10]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=10)
    args = ap.parse_args(argv)

    from oriented_object_detection_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()

    import jax.numpy as jnp

    from bench import _build_detector
    from oriented_object_detection_tpu.config import (DetectConfig,
                                                      ScaleConfig)
    from oriented_object_detection_tpu.infer.pipeline import TiledDetector
    from oriented_object_detection_tpu.utils import profiling as prof
    from tools.train_synthetic import gen_map

    rng = np.random.RandomState(11)
    import os
    fold = os.environ.get("OODT_FOLD_BN", "1") != "0"
    cfg = DetectConfig(
        scales=(ScaleConfig(128, 30), ScaleConfig(416, 100)),
        channels=3, calculate_metrics=True, fold_bn=fold)
    det, weights = _build_detector(cfg, calibrate=False, use_ckpt=True)
    if det is None:
        det, weights = _build_detector(cfg, calibrate=True)
    print(f"weights: {weights}")

    chunks = []
    for _ in range(args.chunks):
        imgs = [gen_map(rng, H=1000, W=1000, n_obj=40)[0]
                for _ in range(args.chunk)]
        chunks.append([jnp.asarray(im) for im in imgs])  # upload once

    det.detect_images(chunks[0])  # warmup/compile both scales
    full_thr = TiledDetector.SPLIT_FETCH_MIN_BYTES

    res = {"prefix": [], "full": []}
    fetch = {"prefix": [], "full": []}
    for rep in range(2):
        for mode, thr in (("prefix", 0), ("full", 1 << 60)):
            TiledDetector.SPLIT_FETCH_MIN_BYTES = thr
            for ch in chunks:
                prof.reset()
                t0 = time.time()
                out = det.detect_images(ch)
                res[mode].append(time.time() - t0)
                fetch[mode].append(
                    prof.report().get("detect/fetch", {}).get("total_s", 0))
                del out
    TiledDetector.SPLIT_FETCH_MIN_BYTES = full_thr

    for mode in ("prefix", "full"):
        w = np.array(res[mode][len(chunks):])   # drop first-rep set
        f = np.array(fetch[mode][len(chunks):])
        print(f"{mode:>6}: wall/chunk med={np.median(w):.3f}s "
              f"(p10={np.percentile(w, 10):.3f} "
              f"p90={np.percentile(w, 90):.3f}), "
              f"fetch med={np.median(f):.3f}s")
    print(f"hints: {det._fetch_hints}")


if __name__ == "__main__":
    main()
