"""Per-step host-time trace of the detect_stream pipeline on 4096^2 maps.

Times each host call in the stream loop (device_put enqueue, D2H fetch,
dispatch, host merge) to locate where the steady-state per-map interval
goes (bench r03c: median 1890 ms vs a ~1300 ms upload-bound floor).

Usage: python tools/profile/stream_trace.py [n_maps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(n=6):
    from oriented_object_detection_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from bench import _build_detector
    from oriented_object_detection_tpu.config import (DetectConfig,
                                                      ScaleConfig)

    rng = np.random.RandomState(0)
    cfg = DetectConfig(
        scales=(ScaleConfig(128, 30), ScaleConfig(416, 100)), channels=3)
    det, _ = _build_detector(cfg, calibrate=True)
    maps = [rng.randint(0, 255, (4096, 4096, 3)).astype(np.uint8)
            for _ in range(n)]
    det.detect_images([maps[0]])         # warmup/compile

    def dispatch(img_dev):
        pending = {
            sc.tile_size: det._dispatch_scale_multi([img_dev], sc)
            for sc in det.cfg.scales
        }
        order = [(ts, p.shape[0], seg)
                 for ts, (p, seg) in pending.items()]
        arrays = [p for _, (p, _) in pending.items()]
        joined = arrays[0] if len(arrays) == 1 else jnp.concatenate(arrays)
        return joined, order

    t0 = time.time()

    def stamp():
        return round(time.time() - t0, 3)

    cur_dev = jnp.asarray(maps[0])
    print(f"{stamp()}  put0 done (blocking asarray)")
    cur = dispatch(cur_dev)
    print(f"{stamp()}  dispatch0 done")
    last_yield = time.time()
    for k, nxt in enumerate(maps[1:], 1):
        t = time.time()
        nxt_dev = jax.device_put(nxt)
        print(f"{stamp()}  put{k} enqueued ({time.time()-t:.3f}s host)")
        t = time.time()
        joined, order = cur
        flat = np.asarray(joined, np.float64)
        print(f"{stamp()}  fetch{k-1} done ({time.time()-t:.3f}s)")
        t = time.time()
        det._split_and_finalize(flat, order, 1)
        print(f"{stamp()}  merge{k-1} done ({time.time()-t:.3f}s)")
        t = time.time()
        cur = dispatch(nxt_dev)
        print(f"{stamp()}  dispatch{k} done ({time.time()-t:.3f}s)  "
              f"[interval {time.time()-last_yield:.3f}s]")
        last_yield = time.time()
    t = time.time()
    joined, order = cur
    flat = np.asarray(joined, np.float64)
    det._split_and_finalize(flat, order, 1)
    print(f"{stamp()}  final fetch+merge ({time.time()-t:.3f}s)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
