"""YOLOv11 building blocks in flax/linen (NHWC, TPU-native).

Fresh implementations of the module family the pinned ultralytics engine
provides (SURVEY.md §2.2: Conv stem -> C3k2 stages -> SPPF -> C2PSA, PAN-FPN
C3k2 neck, DFL): ConvBN+SiLU, Bottleneck, C3k, C3k2 (C2f-style split/concat),
SPPF, C2PSA attention, and DWConv. Layout is NHWC throughout so convolutions
tile directly onto the MXU; BatchNorm uses ultralytics' eps/momentum
(1e-3 / 0.03) so converted torch weights reproduce activations exactly.
"""

from __future__ import annotations

import contextvars
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

BN_EPS = 1e-3
BN_MOMENTUM = 0.97  # flax momentum = 1 - torch momentum (0.03)

# Trace-scoped switch for the FUSED inference graph (the engine's
# fuse()): when a model with `fused_bn=True` traces its body, every
# ConvBN replaces the BatchNorm NODE with a plain `x + bias` (params
# must already be BN-folded, models/fold.py). Measured on the flagship
# x-scale golden 416 program: 18.8 -> 13.2 GB HBM accessed, 33.1 ->
# 28.2 ms device time (tools/profile/bn_fold_ab.py) — XLA does NOT
# fully fuse the runtime-affine BN into the conv epilogue. This is a
# contextvar (set only inside YOLO11OBB.__call__, see yolo11_obb.py)
# so the flag needn't thread through all ~34 block-construction sites.
_FUSED_BN = contextvars.ContextVar("oodt_fused_bn", default=False)


class FoldedBN(nn.Module):
    """Declares the exact same parameter/stat tree as nn.BatchNorm but
    computes only `x + bias` — correct iff the variables were BN-folded
    (scale==1, mean==0, var==1-eps; models/fold.py neutralizes them)."""

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


class ConvBN(nn.Module):
    """Conv2d(no bias) + BatchNorm + SiLU (ultralytics `Conv`)."""

    out_ch: int
    k: int = 1
    s: int = 1
    groups: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.k // 2
        x = nn.Conv(
            self.out_ch, (self.k, self.k), strides=(self.s, self.s),
            padding=((p, p), (p, p)), feature_group_count=self.groups,
            use_bias=False, name="conv",
            dtype=x.dtype,
        )(x)
        if _FUSED_BN.get() and not train:
            x = FoldedBN(name="bn")(x)
        else:
            x = nn.BatchNorm(
                use_running_average=not train, epsilon=BN_EPS,
                momentum=BN_MOMENTUM, name="bn", dtype=x.dtype,
            )(x)
        return nn.silu(x) if self.act else x


class DWConv(nn.Module):
    """Depthwise ConvBN (groups == channels)."""

    out_ch: int
    k: int = 3
    s: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBN(self.out_ch, self.k, self.s, groups=x.shape[-1],
                      act=self.act, name="dw")(x, train)


class Bottleneck(nn.Module):
    out_ch: int
    shortcut: bool = True
    k: tuple = (3, 3)
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.out_ch * self.e)
        y = ConvBN(c_, self.k[0], name="cv1")(x, train)
        y = ConvBN(self.out_ch, self.k[1], name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.out_ch:
            y = x + y
        return y


class C3k(nn.Module):
    """C3 block with configurable inner kernel (n inner bottlenecks, e=1.0)."""

    out_ch: int
    n: int = 2
    shortcut: bool = True
    e: float = 0.5
    k: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.out_ch * self.e)
        a = ConvBN(c_, 1, name="cv1")(x, train)
        b = ConvBN(c_, 1, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, k=(self.k, self.k), e=1.0,
                           name=f"m_{i}")(a, train)
        return ConvBN(self.out_ch, 1, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train)


class C3k2(nn.Module):
    """C2f-style split/grow/concat block; inner units are C3k (c3k=True,
    m/l/x scales) or plain Bottlenecks (n/s)."""

    out_ch: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.out_ch * self.e)
        y = ConvBN(2 * c, 1, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.c3k:
                nxt = C3k(c, 2, self.shortcut, name=f"m_{i}")(ys[-1], train)
            else:
                nxt = Bottleneck(c, self.shortcut, k=(3, 3), e=0.5,
                                 name=f"m_{i}")(ys[-1], train)
            ys.append(nxt)
        return ConvBN(self.out_ch, 1, name="cv2")(
            jnp.concatenate(ys, axis=-1), train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained stride-1 maxpools."""

    out_ch: int
    k: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = ConvBN(c_, 1, name="cv1")(x, train)
        p = self.k // 2
        ys = [y]
        for _ in range(3):
            ys.append(nn.max_pool(
                ys[-1], (self.k, self.k), strides=(1, 1),
                padding=((p, p), (p, p))))
        return ConvBN(self.out_ch, 1, name="cv2")(
            jnp.concatenate(ys, axis=-1), train)


class Attention(nn.Module):
    """PSA multi-head attention over the flattened spatial dim with a
    depthwise positional-encoding branch."""

    dim: int
    num_heads: int
    attn_ratio: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        nh = self.num_heads
        head_dim = self.dim // nh
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim ** -0.5
        nh_kd = key_dim * nh
        h = self.dim + nh_kd * 2

        qkv = ConvBN(h, 1, act=False, name="qkv")(x, train)
        n = H * W
        qkv = qkv.reshape(B, n, nh, key_dim * 2 + head_dim)
        q = qkv[..., :key_dim]                       # [B, N, nh, kd]
        k = qkv[..., key_dim:2 * key_dim]
        v = qkv[..., 2 * key_dim:]                   # [B, N, nh, hd]

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(B, H, W, self.dim)

        pe = ConvBN(self.dim, 3, groups=self.dim, act=False,
                    name="pe")(v.reshape(B, H, W, self.dim), train)
        out = out + pe
        return ConvBN(self.dim, 1, act=False, name="proj")(out, train)


class PSABlock(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + Attention(self.dim, self.num_heads, name="attn")(x, train)
        y = ConvBN(self.dim * 2, 1, name="ffn_0")(x, train)
        y = ConvBN(self.dim, 1, act=False, name="ffn_1")(y, train)
        return x + y


class C2PSA(nn.Module):
    """Partial self-attention stage: split, run PSA blocks on half, rejoin."""

    out_ch: int
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.out_ch * self.e)
        y = ConvBN(2 * c, 1, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            b = PSABlock(c, max(1, c // 64), name=f"m_{i}")(b, train)
        return ConvBN(self.out_ch, 1, name="cv2")(
            jnp.concatenate([a, b], axis=-1), train)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (NHWC)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def make_divisible(v: float, divisor: int = 8) -> int:
    return max(divisor, int(v + divisor / 2) // divisor * divisor)
