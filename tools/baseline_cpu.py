"""Measured stand-in for the reference's CPU throughput.

The reference (ultralytics, not installed in this image) runs one
yolo11x-obb predict call per tile on the host CPU. This tool measures an
architecturally equivalent workload — per-tile serial fp32 forwards of our
yolo11x-obb at each scale on the JAX CPU backend, including decode + NMS —
and extrapolates to the golden dual-scale workload (90+9 / 121+16 tiles).

Writes the number used as bench.py's REFERENCE_TILES_PER_SEC so
vs_baseline is anchored to a measurement on this very machine.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(n_tiles: int = 3):
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from oriented_object_detection_tpu.models import YOLO11OBB
    from oriented_object_detection_tpu.models import decode as D

    rng = np.random.RandomState(0)
    per_scale = {}
    for ts in (128, 416):
        model = YOLO11OBB(nc=12, scale="x", in_channels=3)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, ts, ts, 3), jnp.float32))

        @jax.jit
        def fwd(p, x):
            out = model.apply(p, x)
            rbox, scores = D.decode_raw(out, x.shape[1])
            return D.postprocess_batch(rbox, scores, 0.25, 0.7,
                                       max_det=64, pre_topk=256)

        x = jnp.asarray(rng.rand(1, ts, ts, 3), jnp.float32)
        jax.block_until_ready(fwd(params, x))  # compile
        t0 = time.time()
        for _ in range(n_tiles):
            jax.block_until_ready(fwd(params, x))
        per_scale[ts] = (time.time() - t0) / n_tiles
        print(f"ts={ts}: {per_scale[ts]*1000:.0f} ms/tile (serial CPU fp32)")

    # golden dual-scale workload
    total_tiles = 90 + 9 + 121 + 16
    total_time = (90 + 121) * per_scale[128] + (9 + 16) * per_scale[416]
    tps = total_tiles / total_time
    print(json.dumps({
        "metric": "reference-equivalent serial CPU tiles/sec "
                  "(per-tile yolo11x-obb fp32 forwards, golden workload)",
        "value": round(tps, 3),
        "unit": "tiles/sec",
        "per_tile_ms": {k: round(v * 1000, 1)
                        for k, v in per_scale.items()},
    }))


if __name__ == "__main__":
    main()
