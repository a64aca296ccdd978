"""Device-time profile of the fused per-scale inference programs.

Times each scale's jitted program in isolation (block_until_ready, no
fetch payload cost) and derives achieved FLOP/s from XLA's cost analysis
— the VERDICT r02 item: either >50 TFLOP/s conv efficiency at golden
geometry or a documented reason it is launch-latency/memory-bound.

Usage: python tools/profile/device_forward.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from oriented_object_detection_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()

    from oriented_object_detection_tpu.config import (DetectConfig,
                                                      ScaleConfig)
    from bench import _build_detector

    cfg = DetectConfig(
        scales=(ScaleConfig(128, 30), ScaleConfig(416, 100)), channels=3)
    det, _ = _build_detector(cfg, calibrate=False)

    rng = np.random.RandomState(0)
    images = [
        rng.randint(0, 255, (807, 895, 3)).astype(np.uint8),
        rng.randint(0, 255, (1028, 1056, 3)).astype(np.uint8),
    ]
    images_dev = [jnp.asarray(im) for im in images]
    jax.block_until_ready(images_dev)

    for sc in cfg.scales:
        packed, segments = det._dispatch_scale_multi(images_dev, sc)
        jax.block_until_ready(packed)  # compile + warm
        reps = 10
        t0 = time.time()
        for _ in range(reps):
            packed, _ = det._dispatch_scale_multi(images_dev, sc)
            jax.block_until_ready(packed)
        dt = (time.time() - t0) / reps

        # FLOP count from XLA cost analysis of the compiled program
        ts = sc.tile_size
        run = None
        for k, v in det._fns.items():
            if k[0] == "fused" and k[1] == ts:
                run = v
        grids = jnp.zeros((sum(s[2] for s in segments), 4), jnp.int32)
        valid = jnp.zeros((sum(s[2] for s in segments),), bool)
        lowered = run.lower(det.params[ts], tuple(images_dev), grids,
                            valid, jnp.float32(0.25))
        cost = lowered.compile().cost_analysis()
        flops = float(cost.get("flops", 0.0))
        print(f"scale {ts}: {dt*1000:.1f} ms/rep, "
              f"{flops/1e12:.2f} TFLOP/program, "
              f"{flops/dt/1e12:.1f} TFLOP/s achieved, "
              f"bytes accessed {float(cost.get('bytes accessed', 0))/1e9:.2f} GB "
              f"({float(cost.get('bytes accessed', 0))/dt/1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
