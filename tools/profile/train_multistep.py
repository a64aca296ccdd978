"""Per-program dispatch overhead in the training loop.

VERDICT (2026-08-18): the one-program 50.0 ms/step below is an
ARTIFACT — the unrolled steps all consume the SAME traced batch value,
so XLA CSEs the batch-fixed work across steps. With distinct batch
slices (stack_batches group, the real training case) the 8-step
program measures 59.6 ms/step, equal to the python loop: per-program
dispatch overhead on this box is negligible, and multi-step dispatch
(TrainConfig.steps_per_dispatch) is perf-neutral here. Lesson for
chained-K microbenchmarks: feed DISTINCT traced inputs per iteration
or the chain under-measures.

opt_stage.py showed sgd+EMA is ~free on device, yet the python-loop
train step measures ~59 ms vs ~35 ms for value_and_grad alone — the gap
is per-PROGRAM turnaround through the tunnel, not device work. Compare:
  (a) python loop: K separate step_fn dispatches (the production fit
      loop today),
  (b) one program: K steps unrolled inside a single jit (same math,
      zero per-step dispatch),
on the same donated state/batch. If (b) is much faster per step, a
multi-step scan is a real trainer optimization on this box.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(batch: int = 16, ts: int = 416, scale: str = "x"):
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

    def _t(fn):
        t0 = time.time()
        fn()
        return time.time() - t0

    # step_fn donates its input state and device_put may alias — keep a
    # host snapshot to mint fresh states per phase
    state_host = jax.tree.map(np.asarray, state)

    def fresh():
        return jax.tree.map(jnp.asarray, state_host)

    # (a) python loop of separate dispatches
    st = fresh()
    def run_py(K):
        nonlocal st
        t0 = time.time()
        m = None
        for _ in range(K):
            st, m = step_fn(st, batch_d)
        np.asarray(m)
        return time.time() - t0
    run_py(1)
    t1 = np.median([run_py(1) for _ in range(3)])
    t8 = np.median([run_py(8) for _ in range(3)])
    py_ms = (t8 - t1) / 7 * 1000.0
    print(f"python-loop dispatches: {py_ms:.1f} ms/step")

    # (b) K steps in ONE program (step_fn inlines under the outer jit)
    def multi(K):
        @jax.jit
        def stepsK(s, b):
            m = None
            for _ in range(K):
                s, m = step_fn(s, b)
            return s, m
        return stepsK

    s1, s8 = multi(1), multi(8)
    st2, m = s1(fresh(), batch_d)
    np.asarray(m)
    st2, m = s8(st2, batch_d)
    np.asarray(m)

    def run_one(fn, s0):
        t0 = time.time()
        s, m = fn(s0, batch_d)
        np.asarray(m)
        return time.time() - t0, s

    times1, times8 = [], []
    s_cur = st2
    for _ in range(3):
        dt, s_cur = run_one(s1, s_cur)
        times1.append(dt)
    for _ in range(3):
        dt, s_cur = run_one(s8, s_cur)
        times8.append(dt)
    one_ms = (np.median(times8) - np.median(times1)) / 7 * 1000.0
    print(f"one-program 8-step: {one_ms:.1f} ms/step "
          f"(per-program overhead ≈ {py_ms - one_ms:.1f} ms)")


if __name__ == "__main__":
    main()
