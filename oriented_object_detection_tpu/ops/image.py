"""General image ops: letterbox and elastic transform.

* `letterbox` — ultralytics-style aspect-preserving resize + pad-114 to a
  target square (stride-rounded), returning the scale/pad needed to map
  detections back (SURVEY.md §2.2 "Predictor": the tiled pipeline bypasses
  this because tiles are already model-sized, but arbitrary-size inputs and
  the weight-parity harness need it).
* `elastic_transform` — the reference implements (and disables) an elastic
  warp (`Train_OBB.py:431-443`); provided here as a batched device op
  (gaussian-filtered displacement field + bilinear remap).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .dtedge import _gaussian_kernel_1d, _sep_conv2d


def letterbox(img: jnp.ndarray, new_size: int, pad_value: int = 114,
              scaleup: bool = True):
    """[H, W, C] -> ([new, new, C], ratio, (dw, dh)).

    Resize preserving aspect to fit new_size, center-pad with pad_value.
    Detections map back as (x - dw) / ratio.
    """
    h, w = img.shape[:2]
    r = min(new_size / h, new_size / w)
    if not scaleup:
        r = min(r, 1.0)
    nh, nw = int(round(h * r)), int(round(w * r))
    resized = jax.image.resize(
        img.astype(jnp.float32), (nh, nw, img.shape[2]), "linear")
    dh, dw = (new_size - nh) / 2, (new_size - nw) / 2
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    out = jnp.full((new_size, new_size, img.shape[2]), float(pad_value),
                   jnp.float32)
    out = jax.lax.dynamic_update_slice(out, resized, (top, left, 0))
    return out, r, (left, top)


def elastic_transform(img: jnp.ndarray, rng_key, alpha: float | None = None,
                      sigma: float | None = None) -> jnp.ndarray:
    """Elastic warp of [H, W, C] (reference semantics, enabled):
    displacement = gaussian_filter(U(-1,1)) * alpha, bilinear remap with
    reflect border."""
    h, w = img.shape[:2]
    if alpha is None:
        alpha = min(h, w) * 0.03
    if sigma is None:
        sigma = alpha * 0.1

    k1, k2 = jax.random.split(rng_key)
    dx = jax.random.uniform(k1, (h, w), minval=-1.0, maxval=1.0)
    dy = jax.random.uniform(k2, (h, w), minval=-1.0, maxval=1.0)
    kern = _gaussian_kernel_1d(max(sigma, 0.1))
    dx = _sep_conv2d(dx, kern, kern) * alpha
    dy = _sep_conv2d(dy, kern, kern) * alpha

    ys = jnp.clip(jnp.arange(h, dtype=jnp.float32)[:, None] + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w, dtype=jnp.float32)[None, :] + dx, 0, w - 1)

    def sample_channel(c):
        return jax.scipy.ndimage.map_coordinates(
            c, [ys, xs], order=1, mode="nearest")

    return jnp.stack(
        [sample_channel(img[..., c].astype(jnp.float32))
         for c in range(img.shape[2])], axis=-1)
