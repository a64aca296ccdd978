"""A/B: serial detect_images vs pipelined detect_stream on large maps.

Decides whether the bench's large-map metric should use the stream path.
Run serially (one TPU process): `python tools/profile/stream_ab.py [n_maps]`.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from oriented_object_detection_tpu.utils.runtime import enable_compilation_cache


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    enable_compilation_cache()
    import bench
    from oriented_object_detection_tpu.config import (DetectConfig,
                                                      ScaleConfig)
    det, weights = bench._build_detector(DetectConfig(
        scales=(ScaleConfig(128, 30), ScaleConfig(416, 100)), channels=3),
        calibrate=True)
    print("weights:", weights)
    rng = np.random.RandomState(0)
    maps = [rng.randint(0, 255, (4096, 4096, 3)).astype(np.uint8)
            for _ in range(n)]

    det.detect_images([maps[0]])  # warmup/compile
    # serial: one map at a time (upload + compute + fetch + merge per map)
    t0 = time.time()
    for m in maps:
        det.detect_images([m])
    serial = time.time() - t0
    print(f"serial  : {serial:.2f}s total, {serial / n:.3f}s/map")

    # streamed: next upload enqueued between dispatch and fetch
    t0 = time.time()
    ts = [t0]
    for _ in det.detect_stream(maps):
        ts.append(time.time())
    stream = ts[-1] - t0
    ivals = np.diff(ts)
    print(f"stream  : {stream:.2f}s total, {stream / n:.3f}s/map, "
          f"intervals {[f'{v:.2f}' for v in ivals]}")


if __name__ == "__main__":
    main()
