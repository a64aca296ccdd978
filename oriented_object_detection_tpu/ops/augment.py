"""Image augmentation ops (batched JAX) + label transforms.

Covers both augmentation surfaces of the reference:

* offline class-balancing augmentation (`Train_OBB.py:446-510`): scale
  x1.2, integer shift +-30 px, HSV S/V jitter x U(0.6, 1.4) — with the
  same label math (normalized labels unchanged by scaling except the
  int-rounded new size; shift/clip; 4-decimal dedup is applied by the
  dataset builder);
* train-time loader augmentation (engine defaults): horizontal flip and
  HSV jitter on device, with OBB corner-label transforms.

Color conversions match cv2's uint8 HSV ranges (H in 0..179).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv2.INTER_LINEAR-compatible resize for [..., H, W, C] via
    jax.image.resize (half-pixel centers)."""
    return jax.image.resize(
        img, (*img.shape[:-3], out_h, out_w, img.shape[-1]), "linear")


def shift_image(img: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """Integer translation with zero fill (cv2.warpAffine with a pure
    translation matrix on border constant 0)."""
    out = jnp.zeros_like(img)
    H, W = img.shape[-3], img.shape[-2]
    ys = slice(max(-dy, 0), H - max(dy, 0))
    yd = slice(max(dy, 0), H - max(-dy, 0))
    xs = slice(max(-dx, 0), W - max(dx, 0))
    xd = slice(max(dx, 0), W - max(-dx, 0))
    return out.at[..., yd, xd, :].set(img[..., ys, xs, :])


def bgr_to_hsv_u8(bgr: jnp.ndarray) -> jnp.ndarray:
    """cv2 BGR(u8) -> HSV(u8): H 0..179, S/V 0..255. Float-valued arrays."""
    b = bgr[..., 0].astype(jnp.float32)
    g = bgr[..., 1].astype(jnp.float32)
    r = bgr[..., 2].astype(jnp.float32)
    v = jnp.maximum(jnp.maximum(b, g), r)
    mn = jnp.minimum(jnp.minimum(b, g), r)
    diff = v - mn
    s = jnp.where(v > 0, diff / jnp.maximum(v, 1e-9) * 255.0, 0.0)
    safe = jnp.maximum(diff, 1e-9)
    h = jnp.where(
        v == r, 60.0 * (g - b) / safe,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe,
                  240.0 + 60.0 * (r - g) / safe))
    h = jnp.where(diff == 0, 0.0, h)
    h = jnp.where(h < 0, h + 360.0, h) / 2.0  # cv2 packs H/2 for uint8
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_bgr_u8(hsv: jnp.ndarray) -> jnp.ndarray:
    h = hsv[..., 0] * 2.0
    s = hsv[..., 1] / 255.0
    v = hsv[..., 2]
    c = v * s
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    z = jnp.zeros_like(c)
    idx = jnp.floor(hp).astype(jnp.int32) % 6
    r = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4],
                   [c, x, z, z, x], c)
    g = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4],
                   [x, c, c, x, z], z)
    b = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4],
                   [z, z, x, c, c], x)
    m = v - c
    return jnp.stack([b + m, g + m, r + m], axis=-1)


def hsv_jitter(bgr_u8: jnp.ndarray, s_gain: float, v_gain: float
               ) -> jnp.ndarray:
    """S,V channel scaling with clip (`Train_OBB.py:492-496`). Returns
    uint8-valued float image."""
    hsv = bgr_to_hsv_u8(bgr_u8)
    hsv = hsv.at[..., 1].multiply(s_gain)
    hsv = hsv.at[..., 2].multiply(v_gain)
    hsv = jnp.clip(hsv, 0.0, 255.0)
    # reference rounds via astype(uint8) after clip: truncation
    hsv = jnp.floor(hsv)
    return jnp.clip(jnp.round(hsv_to_bgr_u8(hsv)), 0, 255)


def fliplr_image(img: jnp.ndarray) -> jnp.ndarray:
    return img[..., :, ::-1, :]


def fliplr_corners8(c8: jnp.ndarray, width: float) -> jnp.ndarray:
    """Mirror OBB corner labels horizontally (pixel coords)."""
    out = c8.at[..., 0::2].set(width - c8[..., 0::2])
    return out


# --- label math for the offline class-balancing augmentations -------------

def scale_labels_norm(labels: jnp.ndarray, w: int, h: int,
                      factor: float = 1.2):
    """`Train_OBB.py:462-471`: scaled image size is int-rounded, so
    normalized labels shift by w*f/int(w*f)."""
    nw, nh = int(w * factor), int(h * factor)
    out = labels.astype(jnp.float64)
    out = out.at[..., 1::2].multiply(w * factor / nw)
    out = out.at[..., 2::2].multiply(h * factor / nh)
    return jnp.clip(out, 0.0, 1.0).at[..., 0].set(labels[..., 0]), (nh, nw)


def shift_labels_norm(labels: jnp.ndarray, w: int, h: int,
                      dx: int, dy: int):
    """`Train_OBB.py:480-487`: denormalize, shift, renormalize, clip."""
    out = labels.astype(jnp.float64)
    out = out.at[..., 1::2].set(
        jnp.clip((out[..., 1::2] * w + dx) / w, 0.0, 1.0))
    out = out.at[..., 2::2].set(
        jnp.clip((out[..., 2::2] * h + dy) / h, 0.0, 1.0))
    return out.at[..., 0].set(labels[..., 0])
