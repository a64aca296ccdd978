"""A/B: does REMOVING the BatchNorm math from the inference graph buy
device time, given params already BN-folded (VERDICT r03 weak #4)?

A = production graph (ConvBN: conv -> BatchNorm(running stats) -> SiLU)
    with fold-neutralized params (models/fold.py: BN computes x + bias).
B = same network with the BatchNorm NODE replaced by a plain `x + bias`
    (identical parameter tree; scale/mean/var declared but unused so XLA
    DCEs them) — what ultralytics' fuse() does structurally.

Expectation to test: the BN affine is already fused by XLA into the
conv's consumer fusion alongside SiLU, so removing the multiply/subtract
changes ALU count inside an HBM-bound fusion but not bytes accessed —
predicting ~no wall change. Measured via the marker-fetch method
(block_until_ready only acks enqueue through the tunnel) with
interleaved A/B reps, plus XLA cost-analysis bytes for both graphs.

BEWARE the jit cache when A/B-ing monkeypatched module variants
(CLAUDE.md): each variant gets its own detector instance and is TRACED
(warmed) while its patch is active; timing runs after both traces.

Usage: python tools/profile/bn_fold_ab.py [--reps 10]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--x-random", action="store_true",
                    help="flagship x-scale random init instead of the "
                         "n-scale trained ckpts (the HBM-bound config "
                         "the r03 verdict profiled at 53 ms golden)")
    args = ap.parse_args(argv)

    from oriented_object_detection_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from bench import _build_detector
    from oriented_object_detection_tpu.config import (DetectConfig,
                                                      ScaleConfig)
    from oriented_object_detection_tpu.models import layers as L

    cfg = DetectConfig(
        scales=(ScaleConfig(128, 30), ScaleConfig(416, 100)), channels=3)
    # trained checkpoints; fold_bn=True (default) neutralizes BN params
    if args.x_random:
        detA, weights = _build_detector(cfg, calibrate=False)
    else:
        detA, weights = _build_detector(cfg, calibrate=False,
                                        use_ckpt=True)
        if detA is None:
            print(f"no checkpoints: {weights}; using random init")
            detA, weights = _build_detector(cfg, calibrate=True)
    print(f"weights: {weights}")

    rng = np.random.RandomState(0)
    images = [
        rng.randint(0, 255, (807, 895, 3)).astype(np.uint8),
        rng.randint(0, 255, (1028, 1056, 3)).astype(np.uint8),
    ]
    images_dev = [jnp.asarray(im) for im in images]

    # ---- variant B: BatchNorm node replaced by x + bias ----------------
    class FoldedBN(nn.Module):
        @nn.compact
        def __call__(self, x):
            c = x.shape[-1]
            self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            self.variable("batch_stats", "mean",
                          lambda: jnp.zeros((c,), jnp.float32))
            self.variable("batch_stats", "var",
                          lambda: jnp.ones((c,), jnp.float32))
            return x + bias.astype(x.dtype)

    class FusedConvBN(L.ConvBN):
        """ConvBN with the BatchNorm NODE replaced (same param tree)."""

        @nn.compact
        def __call__(self, x, train: bool = False):
            p = self.k // 2
            x = nn.Conv(self.out_ch, (self.k, self.k),
                        strides=(self.s, self.s), padding=((p, p), (p, p)),
                        feature_group_count=self.groups, use_bias=False,
                        name="conv", dtype=x.dtype)(x)
            x = FoldedBN(name="bn")(x)
            return nn.silu(x) if self.act else x

    # monkeypatching Module.__call__ post-hoc bypasses the linen
    # metaclass (scope handling breaks) — swap the CLASS symbol in every
    # namespace that references it instead
    from oriented_object_detection_tpu.models import yolo11_obb as Y

    orig = L.ConvBN

    # trace A (unpatched), then B under the patch
    pendA = {sc.tile_size: detA._dispatch_scale_multi(images_dev, sc)
             for sc in cfg.scales}
    for p, _ in pendA.values():
        np.asarray(p)

    L.ConvBN = FusedConvBN
    Y.ConvBN = FusedConvBN
    try:
        if args.x_random:
            detB, _ = _build_detector(cfg, calibrate=False)
        else:
            detB, _ = _build_detector(cfg, calibrate=False, use_ckpt=True)
            if detB is None:
                detB, _ = _build_detector(cfg, calibrate=True)
        pendB = {sc.tile_size: detB._dispatch_scale_multi(images_dev, sc)
                 for sc in cfg.scales}
        for p, _ in pendB.values():
            np.asarray(p)
    finally:
        L.ConvBN = orig
        Y.ConvBN = orig

    # outputs equivalent? compare VALID rows only, conf-sorted (the
    # invalid padding tail carries garbage coords in arbitrary order)
    for ts in pendA:
        from oriented_object_detection_tpu.infer.pipeline import (
            _unpack_rows)

        a = _unpack_rows(np.asarray(pendA[ts][0]))
        b = _unpack_rows(np.asarray(pendB[ts][0]))
        av = a[a[:, 11] > 0.5]
        bv = b[b[:, 11] > 0.5]
        av = av[np.lexsort((av[:, 0], -av[:, 9]))]
        bv = bv[np.lexsort((bv[:, 0], -bv[:, 9]))]
        if av.shape == bv.shape:
            d = np.abs(av - bv).max() if len(av) else 0.0
            print(f"scale {ts}: {len(av)} valid rows, "
                  f"max|A-B| = {d:.3e}")
        else:
            print(f"scale {ts}: VALID COUNT DIFFERS "
                  f"{av.shape} vs {bv.shape}")

    tick = jax.jit(lambda x: x + 1.0)
    np.asarray(tick(jnp.float32(0.0)))

    def device_ms(det, sc, reps):
        for _ in range(2):
            np.asarray(tick(jnp.float32(0.0)))
        t0 = time.time()
        for i in range(reps):
            det._dispatch_scale_multi(images_dev, sc)
            np.asarray(tick(jnp.float32(i)))
        return (time.time() - t0) / reps

    n = 6
    for _ in range(3):
        np.asarray(tick(jnp.float32(0.0)))
    t0 = time.time()
    for i in range(n):
        np.asarray(tick(jnp.float32(i)))
    base = (time.time() - t0) / n
    print(f"marker fetch alone: {base * 1000:.1f} ms")

    for sc in cfg.scales:
        ts = sc.tile_size
        a_times, b_times = [], []
        for _ in range(args.reps):          # interleaved
            a_times.append(device_ms(detA, sc, 3))
            b_times.append(device_ms(detB, sc, 3))
        a = (np.median(a_times) - base) * 1000
        b = (np.median(b_times) - base) * 1000

        def cost(det):
            shapes = tuple(im.shape for im in images_dev)
            segs = det._grids(shapes, sc)[2]
            key = ("fused", ts, sc.overlap, shapes, tuple(segs),
                   det._packed.get(ts) is not None)
            run = det._fns[key]
            c = run.lower(det._params_arg(ts), tuple(images_dev),
                          det._conf_scalar(0.25)).compile(
                ).cost_analysis()
            return (float(c.get("flops", 0)) / 1e12,
                    float(c.get("bytes accessed", 0)) / 1e9)

        fa, ba_ = cost(detA)
        fb, bb = cost(detB)
        print(f"scale {ts}: A {a:.1f} ms ({fa:.2f} TF, {ba_:.2f} GB) | "
              f"B {b:.1f} ms ({fb:.2f} TF, {bb:.2f} GB) | "
              f"delta {a - b:+.1f} ms")


if __name__ == "__main__":
    main()
