"""Device affine warp (cv2.warpAffine INTER_LINEAR/BORDER_CONSTANT twin).

The train loader's mosaic augmentation ends in an affine resample (the
reference's engine delegates it to cv2.warpAffine inside ultralytics; our
round-1 loader kept that host call in the hot loop). This module moves it
on-device with *deterministic, backend-independent* semantics:

* destination->source coordinates are computed on HOST in float64 exactly
  like OpenCV's double-precision path, but kept as separable 1-D tables
  (adelta[out_w], X0[out_h] etc.) quantized to FRAC_BITS=10 fixed point
  (1/1024 px — 32x finer than OpenCV's classic INTER_BITS=5 grid);
* the 2-D combine, 2x2 tap gather, bilinear weights and accumulation are
  pure int32 on device: weights (1024-fy)*(1024-fx)... sum to exactly
  2^20 and `(acc + 2^19) >> 20` casts back to uint8.

Determinism: no float op runs on device at all, so the jitted warp is
bit-identical to the numpy mirror `warp_affine_u8_np` on every backend
(no FMA-fusion or tie-breaking hazards). Accuracy: the 1/1024 coordinate
grid keeps the result within 1 gray level of cv2's float (IPP) kernel on
~99.9% of pixels (documented delta in PARITY.md — cv2 builds with/without
IPP already differ among themselves at exact .5 ties).

tests/test_image_ops.py checks both properties (device==mirror exactly,
|ours - cv2| <= 1).
"""

from __future__ import annotations

import numpy as np

FRAC_BITS = 10
FRAC_ONE = 1 << FRAC_BITS          # 1024
COEF_BITS = 2 * FRAC_BITS          # weight products scale, 2^20
ROUND_HALF = 1 << (COEF_BITS - 1)


def invert_affine(M: np.ndarray) -> np.ndarray:
    """cv2.invertAffineTransform in double precision. M: [2, 3]."""
    M = np.asarray(M, np.float64)
    D = M[0, 0] * M[1, 1] - M[0, 1] * M[1, 0]
    D = 1.0 / D if D != 0.0 else 0.0
    A00 = M[1, 1] * D
    A01 = -M[0, 1] * D
    A10 = -M[1, 0] * D
    A11 = M[0, 0] * D
    b0 = -A00 * M[0, 2] - A01 * M[1, 2]
    b1 = -A10 * M[0, 2] - A11 * M[1, 2]
    return np.array([[A00, A01, b0], [A10, A11, b1]], np.float64)


def affine_deltas(Minv: np.ndarray, out_h: int, out_w: int):
    """Separable fixed-point coordinate tables for a dst->src matrix.

    Host-side float64. Returns int32 1-D arrays
    (adelta[out_w], bdelta[out_w], X0[out_h], Y0[out_h]); the fixed-point
    source coordinate at dst (y, x) is X = X0[y] + adelta[x] (and Y
    alike), with integer part X >> FRAC_BITS and fraction X & (FRAC_ONE-1).
    """
    Minv = np.asarray(Minv, np.float64)
    x = np.arange(out_w, dtype=np.float64)
    y = np.arange(out_h, dtype=np.float64)
    adelta = np.rint(Minv[0, 0] * x * FRAC_ONE).astype(np.int32)
    bdelta = np.rint(Minv[1, 0] * x * FRAC_ONE).astype(np.int32)
    X0 = np.rint((Minv[0, 1] * y + Minv[0, 2]) * FRAC_ONE).astype(np.int32)
    Y0 = np.rint((Minv[1, 1] * y + Minv[1, 2]) * FRAC_ONE).astype(np.int32)
    return adelta, bdelta, X0, Y0


def _interp_np(imgi, border, ix, iy, fx, fy):
    H, W = imgi.shape[:2]

    def tap(iy_, ix_):
        ok = (iy_ >= 0) & (iy_ < H) & (ix_ >= 0) & (ix_ < W)
        v = imgi[np.clip(iy_, 0, H - 1), np.clip(ix_, 0, W - 1)]
        return np.where(ok[..., None], v, border)

    gx, gy = FRAC_ONE - fx, FRAC_ONE - fy
    acc = ((gy * gx)[..., None] * tap(iy, ix)
           + (gy * fx)[..., None] * tap(iy, ix + 1)
           + (fy * gx)[..., None] * tap(iy + 1, ix)
           + (fy * fx)[..., None] * tap(iy + 1, ix + 1))
    return np.clip((acc + ROUND_HALF) >> COEF_BITS, 0, 255).astype(np.uint8)


def warp_affine_u8_np(img: np.ndarray, Minv: np.ndarray,
                      out_h: int, out_w: int, border_value) -> np.ndarray:
    """Numpy mirror of the device warp (the oracle in tests) — uint8
    [H, W, C] in, uint8 [out_h, out_w, C] out, BORDER_CONSTANT.
    Bit-identical to `warp_affine_u8_dev` on every backend."""
    adelta, bdelta, X0, Y0 = affine_deltas(Minv, out_h, out_w)
    X = X0[:, None] + adelta[None, :]
    Y = Y0[:, None] + bdelta[None, :]
    return _interp_np(
        img.astype(np.int32),
        np.asarray(border_value, np.int32).reshape(1, 1, -1),
        X >> FRAC_BITS, Y >> FRAC_BITS,
        X & (FRAC_ONE - 1), Y & (FRAC_ONE - 1))


# ---------------------------------------------------------------------------
# Device side
# ---------------------------------------------------------------------------

def warp_affine_u8_dev(img, adelta, bdelta, X0, Y0, border_value):
    """Device warp of one image from host-precomputed coordinate tables.

    img: [H, W, C] uint8-valued; adelta/bdelta [out_w] int32, X0/Y0
    [out_h] int32 (from `affine_deltas`); returns uint8 [out_h, out_w, C].
    Pure int32 arithmetic — bit-identical to `warp_affine_u8_np`."""
    import jax.numpy as jnp

    X = X0[:, None] + adelta[None, :]
    Y = Y0[:, None] + bdelta[None, :]
    ix, iy = X >> FRAC_BITS, Y >> FRAC_BITS
    fx, fy = X & (FRAC_ONE - 1), Y & (FRAC_ONE - 1)

    H, W = img.shape[0], img.shape[1]
    imgi = img.astype(jnp.int32)
    border = jnp.asarray(border_value, jnp.int32).reshape(1, 1, -1)

    def tap(iy_, ix_):
        ok = (iy_ >= 0) & (iy_ < H) & (ix_ >= 0) & (ix_ < W)
        v = imgi[jnp.clip(iy_, 0, H - 1), jnp.clip(ix_, 0, W - 1)]
        return jnp.where(ok[..., None], v, border)

    gx, gy = FRAC_ONE - fx, FRAC_ONE - fy
    acc = ((gy * gx)[..., None] * tap(iy, ix)
           + (gy * fx)[..., None] * tap(iy, ix + 1)
           + (fy * gx)[..., None] * tap(iy + 1, ix)
           + (fy * fx)[..., None] * tap(iy + 1, ix + 1))
    res = (acc + ROUND_HALF) >> COEF_BITS
    return jnp.clip(res, 0, 255).astype(jnp.uint8)


def warp_axis_aligned_u8_dev(img, adelta, X0, Y0, border_value):
    """Axis-aligned (scale + translate, no rotation/shear) special case
    of `warp_affine_u8_dev`, restructured for TPU.

    The general warp gathers 4 taps with PER-PIXEL 2-D indices — XLA
    lowers that to an element-granular gather that costs ~0.4 s/batch on
    v5e at mosaic shapes (r05 flagship diagnosis). When `bdelta == 0`
    and `X0` is constant (every mosaic affine: M = [[s,0,tx],[0,s,ty]]),
    the source coordinate factorizes as ix(x), iy(y) and the bilinear
    warp is two AXIS gathers with shared 1-D index vectors.

    BIT-IDENTICAL to `warp_affine_u8_dev` by integer-arithmetic
    identity: acc = Σ_dy w_y (Σ_dx w_x · tap) with per-tap border
    substitution factorizing because the border is constant
    (y-invalid tap contributes Σ_dx w_x · border = FRAC_ONE · border).
    Intermediates bound: x-pass ≤ 2^10·255·2 < 2^19; final acc
    ≤ 2·2^10·2^19 = 2^30 < int32 max. Same final rounding/shift.
    """
    import jax.numpy as jnp

    X = X0[0] + adelta                     # [out_w] (X0 constant)
    ix, fx = X >> FRAC_BITS, X & (FRAC_ONE - 1)
    iy, fy = Y0 >> FRAC_BITS, Y0 & (FRAC_ONE - 1)
    H, W = img.shape[0], img.shape[1]
    imgi = img.astype(jnp.int32)
    border = jnp.asarray(border_value, jnp.int32).reshape(1, 1, -1)
    gx, gy = FRAC_ONE - fx, FRAC_ONE - fy

    def tapx(ix_):
        ok = (ix_ >= 0) & (ix_ < W)
        v = jnp.take(imgi, jnp.clip(ix_, 0, W - 1), axis=1)
        return jnp.where(ok[None, :, None], v, border)

    px = gx[None, :, None] * tapx(ix) + fx[None, :, None] * tapx(ix + 1)

    def tapy(iy_):
        ok = (iy_ >= 0) & (iy_ < H)
        v = jnp.take(px, jnp.clip(iy_, 0, H - 1), axis=0)
        return jnp.where(ok[:, None, None], v, border * FRAC_ONE)

    acc = gy[:, None, None] * tapy(iy) + fy[:, None, None] * tapy(iy + 1)
    res = (acc + ROUND_HALF) >> COEF_BITS
    return jnp.clip(res, 0, 255).astype(jnp.uint8)


def warp_affine_u8(img, M, out_h: int, out_w: int, border_value):
    """Convenience: forward matrix M [2,3] (like cv2.warpAffine), single
    image on device."""
    import jax.numpy as jnp

    ad, bd, X0, Y0 = affine_deltas(invert_affine(M), out_h, out_w)
    return warp_affine_u8_dev(
        img, jnp.asarray(ad), jnp.asarray(bd), jnp.asarray(X0),
        jnp.asarray(Y0), border_value)
