"""Train-step time breakdown: forward+loss vs +backward vs full step.

Chained-K device timing (data-dependent chain + ONE fetch — see
CLAUDE.md: block_until_ready only acks enqueue through this tunnel).
Establishes whether the 59 ms/step of yolo11x-obb@416/b16 is a healthy
fwd:bwd ratio (~1:2) or hides an anomaly (e.g. an op with a
pathological VJP). Run alone (one TPU process).
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
    from oriented_object_detection_tpu.train.loss import LossConfig, obb_loss

    cfg = TrainConfig(tile_size=ts, model_scale=scale, channels=3,
                      batch_size=batch)
    model, state, tx = TR.create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100)
    lcfg = LossConfig(img_size=ts)
    step_fn = TR.make_train_step(model, tx, cfg, lcfg)

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
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def loss_only(params, imgs):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            imgs.astype(dtype), train=True, mutable=["batch_stats"])
        loss, _ = obb_loss(out, batch_d["gt_labels"], batch_d["gt_xywhr"],
                           batch_d["gt_mask"], lcfg)
        return loss

    grad_fn = jax.grad(loss_only)

    def timed_chain(fn, K=6):
        def scal(r):
            return jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32))

        def chained(p, imgs):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(K):
                acc = acc + scal(
                    fn(p, imgs + (acc > 1e30).astype(imgs.dtype)))
            return acc
        f1 = jax.jit(lambda p, im: scal(fn(p, im)))
        fK = jax.jit(chained)
        np.asarray(f1(state.params, batch_d["images"]))
        np.asarray(fK(state.params, batch_d["images"]))
        t1 = np.median([_t(lambda: np.asarray(
            f1(state.params, batch_d["images"]))) for _ in range(3)])
        tK = np.median([_t(lambda: np.asarray(
            fK(state.params, batch_d["images"]))) for _ in range(3)])
        return (tK - t1) / (K - 1) * 1000.0

    def _t(fn):
        t0 = time.time()
        fn()
        return time.time() - t0

    fwd_ms = timed_chain(lambda p, im: loss_only(p, im))
    bwd_ms = timed_chain(lambda p, im: grad_fn(p, im))

    # production loss_fn clone WITH aux outputs (parts + mutated BN
    # stats), still no optimizer: isolates the cost of keeping aux
    def loss_aux(params, imgs):
        out, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            imgs.astype(dtype), train=True, mutable=["batch_stats"])
        total, parts = obb_loss(out, batch_d["gt_labels"],
                                batch_d["gt_xywhr"], batch_d["gt_mask"],
                                lcfg)
        return total, (parts, mutated["batch_stats"])

    vg = jax.value_and_grad(loss_aux, has_aux=True)
    bwd_aux_ms = timed_chain(lambda p, im: vg(p, im)[1])

    # full step via the production step_fn, chained through the state
    st = state
    def run(Ksteps):
        nonlocal st
        t0 = time.time()
        m = None
        for _ in range(Ksteps):
            st, m = step_fn(st, batch_d)
        np.asarray(m)
        return time.time() - t0
    run(1)
    t1 = np.median([run(1) for _ in range(3)])
    t8 = np.median([run(8) for _ in range(3)])
    full_ms = (t8 - t1) / 7 * 1000.0

    print(f"fwd+loss: {fwd_ms:.1f} ms | fwd+bwd (grad): {bwd_ms:.1f} ms "
          f"| +aux(parts,BN): {bwd_aux_ms:.1f} ms "
          f"| full step: {full_ms:.1f} ms")
    print(f"bwd:fwd ratio {bwd_ms / max(fwd_ms, 1e-9):.2f}; "
          f"aux overhead {bwd_aux_ms - bwd_ms:.1f} ms; "
          f"optimizer+EMA+pack overhead {full_ms - bwd_aux_ms:.1f} ms")


if __name__ == "__main__":
    main()
