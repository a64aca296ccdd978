"""Training-step throughput benchmark (single chip or data mesh).

Measures the jitted train step (forward+loss+backward+optimizer+EMA) for
the reference's training configuration — yolo11x-obb, tile 416, batch 16
(`Train_OBB.py:27-29, 792-841`) — in images/sec.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(batch: int = 16, ts: int = 416, scale: str = "x",
         steps: int = 30):
    import jax
    import jax.numpy as jnp

    from oriented_object_detection_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()

    from oriented_object_detection_tpu.config import TrainConfig
    from oriented_object_detection_tpu.train import trainer as TR
    from oriented_object_detection_tpu.train.loss import LossConfig

    cfg = TrainConfig(tile_size=ts, model_scale=scale, channels=3,
                      batch_size=batch)
    model, state, tx = TR.create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100)
    step_fn = TR.make_train_step(model, tx, cfg, LossConfig(img_size=ts))

    rng = np.random.RandomState(0)
    M = 16
    boxes = np.zeros((batch, M, 5), np.float32)
    mask = np.zeros((batch, M), bool)
    boxes[:, 0] = [100, 100, 30, 20, 0.3]
    mask[:, 0] = True
    batch_d = {
        "images": jnp.asarray(rng.rand(batch, ts, ts, 3), jnp.float32),
        "gt_labels": jnp.zeros((batch, M), jnp.int32),
        "gt_xywhr": jnp.asarray(boxes),
        "gt_mask": jnp.asarray(mask),
    }

    state, m = step_fn(state, batch_d)  # compile
    jax.block_until_ready(m)
    t0 = time.time()
    for _ in range(steps):
        state, m = step_fn(state, batch_d)
    jax.block_until_ready((state, m))
    dt = (time.time() - t0) / steps

    print(json.dumps({
        "metric": f"yolo11{scale}-obb train step imgs/sec "
                  f"(tile {ts}, batch {batch}, bf16)",
        "value": round(batch / dt, 2),
        "unit": "imgs/sec",
        "step_ms": round(dt * 1000, 1),
    }))


if __name__ == "__main__":
    main()
