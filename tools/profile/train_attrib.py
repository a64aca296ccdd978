"""Attribute the flagship train step's time budget (VERDICT r04 #3).

r04 left a contradiction: chained-variant timings said fwd+loss 23 ms /
+bwd 35 ms / full step 59.4 ms (x-416-b16), the ~24 ms residual was
labeled "program-context scheduling", yet the batch sweep showed
per-image cost RISES with B and multi-step dispatch is perf-neutral —
so the residual scales with work and must live INSIDE the program.

This tool settles it with exact compiler-reported accounting
(`compiled.cost_analysis()`: FLOPs + HBM bytes accessed) for each
program variant, against the v5e roofline (~197 TF/s bf16, ~820 GB/s
HBM), plus honest chained-K device timings where every iteration feeds
DISTINCT batch data (the CSE trap from CLAUDE.md) and params chain
through the optimizer like production.

Variants:
  fwd        — loss only (train-mode apply + assigner + loss)
  fwd_bwd    — value_and_grad with aux (production loss_fn)
  step_noopt — value_and_grad + params - 1e-30*grads (optimizer math
               removed, grads kept alive)
  step_noema — production step minus ema_update
  full       — production make_train_step
Run alone (one TPU process):  python tools/profile/train_attrib.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

PEAK_BF16_TFLOPS = 197.0   # v5e MXU peak
PEAK_HBM_GBPS = 820.0


def _t(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def main(batch: int = 16, ts: int = 416, scale: str = "x",
         out_json: str = "train_attrib_r05.json"):
    import jax
    import jax.numpy as jnp

    from oriented_object_detection_tpu.utils.runtime import (
        enable_compilation_cache, link_health_probe)

    enable_compilation_cache()
    probe = link_health_probe()
    print(f"[attrib] link probe: {probe}")

    from oriented_object_detection_tpu.config import TrainConfig
    from oriented_object_detection_tpu.train import trainer as TR
    from oriented_object_detection_tpu.train.loss import (LossConfig,
                                                          obb_loss)

    cfg = TrainConfig(tile_size=ts, model_scale=scale, channels=3,
                      batch_size=batch)
    model, state, tx = TR.create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100)
    lcfg = LossConfig(img_size=ts)
    step_fn = TR.make_train_step(model, tx, cfg, lcfg)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" \
        else jnp.float32

    # K DISTINCT batches, uploaded once as one [K, ...] group — chained
    # timings must never reuse one traced batch (XLA CSEs batch-fixed
    # work and under-measures; CLAUDE.md train-step anatomy note)
    K = 8
    rng = np.random.RandomState(0)
    M = 16
    boxes = np.zeros((K, batch, M, 5), np.float32)
    mask = np.zeros((K, batch, M), bool)
    boxes[:, :, 0] = [100, 100, 30, 20, 0.3]
    boxes[:, :, 0, 0] += rng.rand(K, batch) * 50   # per-step variation
    mask[:, :, 0] = True
    group = {
        "images": jnp.asarray(rng.rand(K, batch, ts, ts, 3),
                              jnp.float32),
        "gt_labels": jnp.zeros((K, batch, M), jnp.int32),
        "gt_xywhr": jnp.asarray(boxes),
        "gt_mask": jnp.asarray(mask),
    }

    def loss_fn(params, batch_stats, b):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            b["images"].astype(dtype), train=True,
            mutable=["batch_stats"])
        total, parts = obb_loss(out, b["gt_labels"], b["gt_xywhr"],
                                b["gt_mask"], lcfg)
        return total, (parts, mutated["batch_stats"])

    # ----- single-step programs for compiler cost accounting ----------
    b0 = jax.tree.map(lambda x: x[0], group)

    def fwd_prog(params, b):
        return loss_fn(params, state.batch_stats, b)[0]

    def fwd_bwd_prog(params, b):
        (total, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state.batch_stats, b)
        return total, grads

    def full_prog(st, b):
        return step_fn(st, b)

    costs = {}
    lowered = {
        "fwd": jax.jit(fwd_prog).lower(state.params, b0),
        "fwd_bwd": jax.jit(fwd_bwd_prog).lower(state.params, b0),
        "full": jax.jit(full_prog, donate_argnums=(0,)).lower(state, b0),
    }
    for name, low in lowered.items():
        try:
            ca = low.compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            fl = float(ca.get("flops", 0.0))
            by = float(ca.get("bytes accessed", 0.0))
            costs[name] = {
                "tflops": round(fl / 1e12, 3),
                "hbm_gb": round(by / 1e9, 3),
                "mxu_floor_ms": round(fl / (PEAK_BF16_TFLOPS * 1e9), 2),
                "hbm_floor_ms": round(by / (PEAK_HBM_GBPS * 1e6), 2),
            }
        except Exception as e:  # noqa: BLE001 — accounting best-effort
            costs[name] = {"error": f"{type(e).__name__}: {e}"}
    print(f"[attrib] compiler cost analysis: {json.dumps(costs)}")

    # ----- honest chained-K device timings ----------------------------
    # every variant scans the SAME K distinct batches; params advance
    # through the chain via a production-shaped update so param-fixed
    # work cannot be hoisted
    def chain(make_body):
        @jax.jit
        def run(st, grp):
            def body(s, b):
                return make_body(s, b)
            s, outs = jax.lax.scan(body, st, grp, unroll=True)
            return jax.tree.leaves(outs)[0][-1]
        return run

    eps = jnp.float32(1e-30)

    def body_fwd(s, b):
        total, _ = loss_fn(s.params, s.batch_stats, b)
        # drive a params perturbation so iterations stay serialized the
        # way real steps are (no optimizer math in this variant)
        newp = jax.tree.map(
            lambda p: p + eps * total.astype(p.dtype), s.params)
        return s.replace(params=newp), total

    def body_fwd_bwd(s, b):
        (total, (_, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(s.params, s.batch_stats, b)
        newp = jax.tree.map(lambda p, g: p - eps * g.astype(p.dtype),
                            s.params, grads)
        return s.replace(params=newp, batch_stats=new_bs), total

    def body_noema(s, b):
        (total, (parts, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(s.params, s.batch_stats, b)
        hypers = TR.schedule_hypers(s.sched, s.step)
        newp, new_mu = TR.sgd_apply(
            s.params, grads, s.opt_state, hypers, cfg.weight_decay,
            TR.decay_mask(s.params), TR.bias_labels(s.params))
        return s.replace(step=s.step + 1, params=newp,
                         batch_stats=new_bs, opt_state=new_mu), total

    def body_full(s, b):
        return step_fn(s, b)

    variants = {"fwd": body_fwd, "fwd_bwd": body_fwd_bwd,
                "step_noema": body_noema, "full": body_full}
    timings = {}
    for name, body in variants.items():
        runK = chain(body)
        run1 = chain(body)
        g1 = jax.tree.map(lambda x: x[:1], group)
        np.asarray(runK(state, group))      # compile + warm
        np.asarray(run1(state, g1))
        tK = np.median([_t(lambda: np.asarray(runK(state, group)))
                        for _ in range(5)])
        t1 = np.median([_t(lambda: np.asarray(run1(state, g1)))
                        for _ in range(5)])
        ms = (tK - t1) / (K - 1) * 1e3
        timings[name] = round(ms, 2)
        print(f"[attrib] {name}: {ms:.1f} ms/step "
              f"(K={K} chain, distinct batches)")

    # derived attribution
    attrib = {
        "bwd_ms": round(timings["fwd_bwd"] - timings["fwd"], 2),
        "opt_sgd_ms": round(timings["step_noema"] - timings["fwd_bwd"],
                            2),
        "ema_pack_ms": round(timings["full"] - timings["step_noema"], 2),
    }
    full_ms = timings["full"]
    c = costs.get("full", {})
    summary = {
        "config": f"{scale}-{ts}-b{batch}",
        **probe, "timings_ms": timings, "attrib_ms": attrib,
        "costs": costs,
        "imgs_per_sec": round(batch / (full_ms / 1e3), 1),
    }
    if "tflops" in c:
        summary["achieved_tflops"] = round(
            c["tflops"] / (full_ms / 1e3), 1)
        summary["mfu_pct"] = round(
            100 * c["tflops"] / (full_ms / 1e3) / PEAK_BF16_TFLOPS, 1)
        summary["achieved_hbm_gbps"] = round(
            c["hbm_gb"] / (full_ms / 1e3), 1)
        summary["hbm_util_pct"] = round(
            100 * c["hbm_gb"] / (full_ms / 1e3) / PEAK_HBM_GBPS, 1)
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--ts", type=int, default=416)
    ap.add_argument("--scale", default="x")
    ap.add_argument("--out", default="train_attrib_r05.json")
    a = ap.parse_args()
    main(a.batch, a.ts, a.scale, a.out)
