"""YOLOv11-OBB network family (flax/linen, NHWC, TPU-native).

Rebuilds the architecture the reference exercises through ultralytics
(`Train_OBB.py:792` builds `yolo11x-obb.pt`; `Detect_OBB.py:26` loads
fine-tuned 128/416 checkpoints): a CSP backbone (Conv stem, C3k2 stages,
SPPF, C2PSA attention), a PAN-FPN neck, and a 3-scale (P3/P4/P5, strides
8/16/32) OBB detect head with a DFL box branch (4 x reg_max), a class
branch (nc), and an angle branch (ne=1).

Module attribute names mirror the 24-layer ultralytics graph indices
(`l0`..`l23`) so checkpoint conversion is a direct rename.

Supports n/s/m/l/x compound scaling and 3- or 4-channel stems (the 4th
channel being the DT-Edge map, `datasets/GeoMap/data4ch.yaml`).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import C2PSA, C3k2, ConvBN, DWConv, SPPF, upsample2x

# scale -> (depth, width, max_channels); matches yolo11 yaml scales table.
SCALES = {
    "n": (0.50, 0.25, 1024),
    "s": (0.50, 0.50, 1024),
    "m": (0.50, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.50, 512),
}

STRIDES = (8, 16, 32)


def _ch(base: int, width: float, max_ch: int) -> int:
    """parse_model channel scaling: make_divisible(min(c, max_ch)*width, 8)."""
    c = min(base, max_ch) * width
    return max(8, int(math.ceil(c / 8)) * 8)


def _n(base: int, depth: float) -> int:
    return max(1, round(base * depth))


class OBBHead(nn.Module):
    """Per-level OBB detect head: box (4*reg_max DFL logits), cls (nc),
    angle (ne). Raw outputs; decoding lives in `decode.py` so training and
    inference share it.

    Bias init follows the engine's `bias_init`: box final conv biases 1.0,
    cls final conv biases log(5 / nc / (640/stride)^2) — so a freshly
    initialized detector is sparse (sigmoid scores ~1e-4), which both
    stabilizes early training and keeps the fixed-shape postprocess
    realistic."""

    nc: int
    reg_max: int = 16
    ne: int = 1
    c2: int = 64      # box branch width
    c3: int = 128     # cls branch width
    c4: int = 16      # angle branch width

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        boxes, clss, angs = [], [], []
        for i, x in enumerate(feats):
            stride = STRIDES[i]
            cls_bias = float(math.log(5.0 / self.nc / (640.0 / stride) ** 2))

            b = ConvBN(self.c2, 3, name=f"cv2_{i}_0")(x, train)
            b = ConvBN(self.c2, 3, name=f"cv2_{i}_1")(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), name=f"cv2_{i}_2",
                        bias_init=nn.initializers.constant(1.0),
                        dtype=x.dtype)(b)

            c = DWConv(x.shape[-1], 3, name=f"cv3_{i}_0_0")(x, train)
            c = ConvBN(self.c3, 1, name=f"cv3_{i}_0_1")(c, train)
            c = DWConv(self.c3, 3, name=f"cv3_{i}_1_0")(c, train)
            c = ConvBN(self.c3, 1, name=f"cv3_{i}_1_1")(c, train)
            c = nn.Conv(self.nc, (1, 1), name=f"cv3_{i}_2",
                        bias_init=nn.initializers.constant(cls_bias),
                        dtype=x.dtype)(c)

            a = ConvBN(self.c4, 3, name=f"cv4_{i}_0")(x, train)
            a = ConvBN(self.c4, 3, name=f"cv4_{i}_1")(a, train)
            a = nn.Conv(self.ne, (1, 1), name=f"cv4_{i}_2", dtype=x.dtype)(a)

            boxes.append(b)
            clss.append(c)
            angs.append(a)
        return boxes, clss, angs


class YOLO11OBB(nn.Module):
    """Full detector. __call__ returns dict with per-level raw head outputs
    (`box` [B,Hi,Wi,4*reg_max], `cls` [B,Hi,Wi,nc], `ang` [B,Hi,Wi,ne]).
    Input: [B, H, W, C] float (already /255), H and W divisible by 32."""

    nc: int = 12
    scale: str = "x"
    in_channels: int = 3
    reg_max: int = 16
    ne: int = 1
    # FUSED inference graph: every ConvBN computes conv -> +bias -> SiLU
    # instead of running the BatchNorm node (params must be BN-folded,
    # models/fold.py). Parameter tree is identical either way. Measured
    # -15% device time / -30% HBM bytes on the x-scale 416 program
    # (tools/profile/bn_fold_ab.py).
    fused_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.fused_bn and not train:
            from .layers import _FUSED_BN

            token = _FUSED_BN.set(True)
            try:
                return self._body(x, train)
            finally:
                _FUSED_BN.reset(token)
        return self._body(x, train)

    def _body(self, x: jnp.ndarray, train: bool):
        d, w, mc = SCALES[self.scale]
        ch = lambda c: _ch(c, w, mc)
        rep = _n(2, d)
        c3k_ns = self.scale in ("m", "l", "x")  # c3k=True for m/l/x

        # ---- backbone ----
        x = ConvBN(ch(64), 3, 2, name="l0")(x, train)                # P1/2
        x = ConvBN(ch(128), 3, 2, name="l1")(x, train)               # P2/4
        x = C3k2(ch(256), rep, c3k_ns, e=0.25, name="l2")(x, train)
        x = ConvBN(ch(256), 3, 2, name="l3")(x, train)               # P3/8
        p3b = C3k2(ch(512), rep, c3k_ns, e=0.25, name="l4")(x, train)
        x = ConvBN(ch(512), 3, 2, name="l5")(p3b, train)             # P4/16
        p4b = C3k2(ch(512), rep, True, name="l6")(x, train)
        x = ConvBN(ch(1024), 3, 2, name="l7")(p4b, train)            # P5/32
        x = C3k2(ch(1024), rep, True, name="l8")(x, train)
        x = SPPF(ch(1024), 5, name="l9")(x, train)
        p5b = C2PSA(ch(1024), rep, name="l10")(x, train)

        # ---- PAN-FPN neck ----
        x = upsample2x(p5b)                                          # l11
        x = jnp.concatenate([x, p4b], axis=-1)                       # l12
        n13 = C3k2(ch(512), rep, c3k_ns, name="l13")(x, train)
        x = upsample2x(n13)                                          # l14
        x = jnp.concatenate([x, p3b], axis=-1)                       # l15
        p3 = C3k2(ch(256), rep, c3k_ns, name="l16")(x, train)
        x = ConvBN(ch(256), 3, 2, name="l17")(p3, train)
        x = jnp.concatenate([x, n13], axis=-1)                       # l18
        p4 = C3k2(ch(512), rep, c3k_ns, name="l19")(x, train)
        x = ConvBN(ch(512), 3, 2, name="l20")(p4, train)
        x = jnp.concatenate([x, p5b], axis=-1)                       # l21
        p5 = C3k2(ch(1024), rep, True, name="l22")(x, train)

        # ---- OBB head ----
        c2 = max(16, ch(256) // 4, self.reg_max * 4)
        c3 = max(ch(256), min(self.nc, 100))
        c4 = max(ch(256) // 4, self.ne)
        boxes, clss, angs = OBBHead(
            self.nc, self.reg_max, self.ne, c2, c3, c4, name="l23")(
                (p3, p4, p5), train)

        return {"box": boxes, "cls": clss, "ang": angs,
                "feats": (p3, p4, p5)}
