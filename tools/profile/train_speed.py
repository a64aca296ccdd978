"""Train-step throughput on the real TPU for the reference's two
training configs (`Train_OBB.py:796-841`: yolo11x-obb, batch 16, tile
128 and 416), plus the n-scale used by the e2e runs.

Method: device-resident synthetic batch, K chained donated train steps
dispatched back to back, ONE final metric fetch (each D2H through this
box's tunnel costs 35-70 ms RPC — per-step fetches would drown the
step). Run alone (one TPU process). Usage:

    python tools/profile/train_speed.py [--scales n,x] [--steps 20]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench_config(model_scale: str, tile_size: int, batch: int,
                 steps: int) -> float:
    import jax
    import jax.numpy as jnp

    from oriented_object_detection_tpu.config import TrainConfig
    from oriented_object_detection_tpu.train import trainer as TR
    from oriented_object_detection_tpu.train.loss import LossConfig

    cfg = TrainConfig(tile_size=tile_size, batch_size=batch,
                      model_scale=model_scale, epochs=10)
    model, state, _ = TR.create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=50)
    step_fn = TR.make_train_step(
        model, None, cfg, LossConfig(nc=cfg.nc, img_size=tile_size))

    rng = np.random.RandomState(0)
    M = 16
    batch_h = {
        "images": jnp.asarray(
            rng.rand(batch, tile_size, tile_size, cfg.channels)
            .astype(np.float32)),
        "gt_labels": jnp.asarray(
            rng.randint(0, cfg.nc, (batch, M)).astype(np.int32)),
        "gt_xywhr": jnp.asarray(
            np.concatenate([
                rng.uniform(20, tile_size - 20, (batch, M, 2)),
                rng.uniform(8, 30, (batch, M, 2)),
                rng.uniform(-0.7, 2.3, (batch, M, 1)),
            ], axis=-1).astype(np.float32)),
        "gt_mask": jnp.asarray(
            (rng.rand(batch, M) < 0.6).astype(np.bool_)),
    }

    state, m = step_fn(state, batch_h)       # compile
    np.asarray(m)                             # sync

    t0 = time.time()
    for _ in range(steps):
        state, m = step_fn(state, batch_h)
    np.asarray(m)                             # one fetch acks the chain
    dt = (time.time() - t0) / steps
    print(f"  {model_scale}-scale {tile_size}px b{batch}: "
          f"{dt * 1000:.1f} ms/step -> {batch / dt:.1f} imgs/sec")
    return batch / dt


def main():
    from oriented_object_detection_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()

    scales = "n,x"
    steps = 20
    for i, a in enumerate(sys.argv):
        if a == "--scales":
            scales = sys.argv[i + 1]
        if a == "--steps":
            steps = int(sys.argv[i + 1])

    print("train-step throughput (synthetic batch, device-resident, "
          f"{steps} chained steps):")
    for ms in scales.split(","):
        for ts in (128, 416):
            bench_config(ms, ts, batch=16, steps=steps)


if __name__ == "__main__":
    main()
