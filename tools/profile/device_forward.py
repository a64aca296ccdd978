"""Device-time profile of the fused per-scale inference programs.

Measures TRUE device compute per scale and derives achieved FLOP/s and
HBM bandwidth from XLA's cost analysis.

Measurement method: through this box's TPU tunnel, `block_until_ready`
returns when the dispatch is ACKNOWLEDGED, not when the program finishes
(naive timing reports >peak FLOP/s). Only a D2H fetch forces completion,
and programs execute serially on the device stream — so the compute time
of program P is (time of [dispatch P; fetch tiny marker]) minus (time of
[fetch tiny marker] alone).

r02 findings (golden geometry, yolo11x-obb dual-scale, 236 tiles):
marker RPC ~30 ms; device compute ~24 ms @128 / ~36 ms @416 (~53 ms
both); cost analysis: 9.4 GB / 18.8 GB accessed per program => ~48% HBM
bandwidth utilization (memory-bound; the MXU-only floor would be ~5 ms).
End-to-end wall ~230 ms => ~175 ms is tunnel RPC overhead, not device
work. The big-map metric amortizes it; the golden metric is
latency-bound by construction.

r03 addition: --channels 4 profiles the 4ch DT-Edge single-scale 416
config (in-graph banded Pallas EDT). r03 finding: the 4ch program is
forward-bound — the x-scale 416 conv stack dominates (HBM-bound, see
above), with the whole DT-Edge channel (Scharr + bit-search percentiles
+ banded EDT + blend) ~1.1 ms/tile after the r03 kernel work.

Usage: python tools/profile/device_forward.py [--channels 4]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from oriented_object_detection_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()

    from bench import _build_detector
    from oriented_object_detection_tpu.config import (DetectConfig,
                                                      ScaleConfig)

    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=3, choices=(3, 4))
    args = ap.parse_args()

    if args.channels == 4:
        cfg = DetectConfig(scales=(ScaleConfig(416, 100),), channels=4)
    else:
        cfg = DetectConfig(
            scales=(ScaleConfig(128, 30), ScaleConfig(416, 100)),
            channels=3)
    det, _ = _build_detector(cfg, calibrate=False)

    rng = np.random.RandomState(0)
    images = [
        rng.randint(0, 255, (807, 895, 3)).astype(np.uint8),
        rng.randint(0, 255, (1028, 1056, 3)).astype(np.uint8),
    ]
    images_dev = [jnp.asarray(im) for im in images]

    tick = jax.jit(lambda x: x + 1.0)
    np.asarray(tick(jnp.float32(0.0)))       # compile the marker

    # warm every program (a real fetch forces compile + first run)
    seg_by_scale = {}
    for sc in cfg.scales:
        p, segs = det._dispatch_scale_multi(images_dev, sc)
        np.asarray(p)
        seg_by_scale[sc.tile_size] = segs

    n = 10
    for _ in range(3):
        np.asarray(tick(jnp.float32(0.0)))
    t0 = time.time()
    for i in range(n):
        np.asarray(tick(jnp.float32(i)))
    base = (time.time() - t0) / n
    print(f"marker fetch alone: {base * 1000:.1f} ms")

    for sc in cfg.scales:
        t0 = time.time()
        for i in range(n):
            det._dispatch_scale_multi(images_dev, sc)
            np.asarray(tick(jnp.float32(i)))  # waits for the program too
        dt = (time.time() - t0) / n
        compute = dt - base

        ts = sc.tile_size
        run = det._fns[("fused", ts, sc.overlap,
                        tuple(im.shape for im in images_dev),
                        tuple(seg_by_scale[ts]),
                        det._packed.get(ts) is not None)]
        cost = run.lower(det.params[ts], tuple(images_dev),
                         jnp.float32(0.25)).compile().cost_analysis()
        flops = float(cost.get("flops", 0.0))
        gb = float(cost.get("bytes accessed", 0.0)) / 1e9
        print(f"scale {ts}: compute ~{compute * 1000:.1f} ms | "
              f"{flops / 1e12:.2f} TF (cost, MACx2) -> "
              f"{flops / compute / 1e12:.0f} TFLOP/s | "
              f"{gb:.1f} GB -> {gb / compute:.0f} GB/s")


if __name__ == "__main__":
    main()
