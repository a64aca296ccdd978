"""Stage + device-time breakdown of the 4ch DT-Edge 200-tile batch
(bench's `dtedge_4ch_416` metric): wall = dispatch + fetch(+device) +
host merge; device-only time via the marker-fetch method
(device_forward.py). Run alone (one TPU process)."""
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

    from bench import _build_detector
    from oriented_object_detection_tpu.config import (DetectConfig,
                                                      ScaleConfig)
    from oriented_object_detection_tpu.utils import profiling as prof
    from tools.train_synthetic import gen_map

    channels = 3 if "--3ch" in sys.argv else 4
    cfg = DetectConfig(scales=(ScaleConfig(416, 100),), channels=channels)
    det, _ = _build_detector(cfg, calibrate=True)
    print(f"channels={channels}")

    rng = np.random.RandomState(0)
    batch = [gen_map(rng, H=807, W=895, n_obj=40)[0] for _ in range(8)] \
        + [gen_map(rng, H=1028, W=1056, n_obj=40)[0] for _ in range(8)]
    batch = [jnp.asarray(im) for im in batch]
    n_tiles = 8 * 9 + 8 * 16

    det.detect_images(batch)  # warmup/compile
    sc = cfg.scales[0]
    packed, segs = det._dispatch_scale_multi(batch, sc)
    print(f"packed fetch array: {packed.shape} {packed.dtype} = "
          f"{packed.size * packed.dtype.itemsize / 1e6:.2f} MB")
    np.asarray(packed)

    tick = jax.jit(lambda x: x + 1.0)
    np.asarray(tick(jnp.float32(0.0)))
    n = 8
    t0 = time.time()
    for i in range(n):
        np.asarray(tick(jnp.float32(i)))
    base = (time.time() - t0) / n
    print(f"marker fetch alone: {base * 1000:.1f} ms")

    t0 = time.time()
    for i in range(n):
        det._dispatch_scale_multi(batch, sc)
        np.asarray(tick(jnp.float32(i)))
    dt = (time.time() - t0) / n
    print(f"device compute (all programs): ~{(dt - base) * 1000:.1f} ms")

    # fetch-only: dispatch, let it finish, then time np.asarray
    p2, _ = det._dispatch_scale_multi(batch, sc)
    np.asarray(tick(jnp.float32(99.0)))      # device idle now
    t0 = time.time()
    np.asarray(p2)
    print(f"fetch of finished packed array: {(time.time() - t0) * 1000:.1f} ms")

    prof.reset()
    reps = 7
    t0 = time.time()
    for _ in range(reps):
        det.detect_images(batch)
    wall = (time.time() - t0) / reps
    print(f"\nwall/rep: {wall * 1000:.1f} ms -> "
          f"{n_tiles / wall:.1f} tiles/sec")
    rep = prof.report()
    for k, v in rep.items():
        print(f"  {k}: {v['total_s'] / reps * 1000:.1f} ms/rep")


if __name__ == "__main__":
    main()
