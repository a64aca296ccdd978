"""Exact Euclidean distance transform (L2 EDT), batched, TPU-native.

Replaces `cv2.distanceTransform(non_edge, DIST_L2, 3)` in the DT-Edge
channel (`Detect_OBB.py:121`, `Train_OBB.py:645`). Note the reference's
maskSize=3 variant is the Borgefors *chamfer approximation* (weights
0.955/1.3693); this implementation computes the exact EDT via the classic
two-pass separable decomposition:

  pass 1 (columns): d0[i,j] = min_k { |i-k| : mask[k,j] == 0 }
      — forward/backward running-min scans (lax.scan, vectorized over
        batch x width).
  pass 2 (rows):    D[i,j]  = sqrt( min_k d0[i,k]^2 + (j-k)^2 )
      — a min-plus reduction against the parabola matrix. Dense but
        embarrassingly parallel; implemented as a Pallas TPU kernel tiled
        (rows x j-block) with the k-loop running in VMEM, plus a chunked
        pure-XLA fallback for CPU/debug.

Exactness: pass2 brute-forces the true lower envelope, so the result equals
scipy.ndimage.distance_transform_edt bit-for-bit in squared space.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_INF = 1e9


def _edt_pass1_columns(edge: jnp.ndarray) -> jnp.ndarray:
    """Per-column distance (in rows) to the nearest edge pixel.

    edge: [..., H, W] bool (True = edge/zero pixel). Returns float32
    [..., H, W] vertical distances (capped at _INF where a column has no
    edge).

    Log-step doubling instead of a length-H lax.scan: with offsets
    s = 1, 2, 4, ... the update d[i] = min(d[i], d[i-s]+s, d[i+s]+s)
    is EXACT after ceil(log2 H) rounds (any distance m <= 2^(k+1)-1
    decomposes greedily into distinct processed offsets), and each round
    is one full-array vector op — a serial 416-step scan on TPU is
    latency-bound and dominated the DT-Edge channel's device time."""
    d = jnp.where(edge, 0.0, _INF).astype(jnp.float32)
    H = d.shape[-2]
    pad_shape = list(d.shape)
    s = 1
    while s < H:
        pad_shape[-2] = s
        inf_pad = jnp.full(pad_shape, _INF, jnp.float32)
        up = jnp.concatenate([d[..., s:, :], inf_pad], axis=-2) + float(s)
        down = jnp.concatenate([inf_pad, d[..., :-s, :]], axis=-2) \
            + float(s)
        d = jnp.minimum(d, jnp.minimum(up, down))
        s *= 2
    return d


def _edt_pass2_rows_xla(d0: jnp.ndarray, chunk: int = 32) -> jnp.ndarray:
    """Min-plus against parabolas, chunked over output columns (pure XLA).

    d0: [..., H, W] vertical distances; returns squared distances."""
    f = jnp.minimum(d0, _INF) ** 2  # [..., H, W]
    W = f.shape[-1]
    k = jnp.arange(W, dtype=jnp.float32)
    pad = (-W) % chunk
    nchunks = (W + pad) // chunk

    def one_chunk(c):
        j = c * chunk + jnp.arange(chunk, dtype=jnp.float32)  # [chunk]
        para = (j[:, None] - k[None, :]) ** 2                 # [chunk, W]
        # [..., H, chunk, W] -> min over W
        return jnp.min(f[..., None, :] + para, axis=-1)

    out = jax.lax.map(one_chunk, jnp.arange(nchunks))  # [nchunks, ..., H, chunk]
    out = jnp.moveaxis(out, 0, -2)                     # [..., H, nchunks, chunk]
    out = out.reshape(*f.shape[:-1], nchunks * chunk)[..., :W]
    return out


def _edt_pass2_rows_pallas(d0: jnp.ndarray) -> jnp.ndarray:
    """Pallas TPU kernel for pass 2. d0: [N, W] (rows flattened); returns
    squared distances [N, W]. W must be a multiple of 128, N of 8."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, W = d0.shape
    ROWS = 8
    JBLK = 128

    def kernel(f_ref, out_ref):
        jb = pl.program_id(1)
        j = (jb * JBLK + jax.lax.broadcasted_iota(
            jnp.int32, (1, JBLK), 1)).astype(jnp.float32)    # [1, JBLK]
        acc = jnp.full((ROWS, JBLK), _INF, jnp.float32)

        def body(kb, acc):
            kk = (kb * JBLK + jax.lax.broadcasted_iota(
                jnp.int32, (JBLK, 1), 0)).astype(jnp.float32)  # [JBLK, 1]
            para = (j - kk) ** 2                         # [JBLK, JBLK]
            # dynamic slice must go through the ref, not a loaded array
            fblk = f_ref[:, pl.ds(kb * JBLK, JBLK)]      # [ROWS, JBLK]
            fblk = jnp.minimum(fblk, _INF) ** 2
            cand = fblk[:, :, None] + para[None, :, :]   # [ROWS, K, J]
            return jnp.minimum(acc, cand.min(axis=1))

        acc = jax.lax.fori_loop(0, W // JBLK, body, acc)
        out_ref[...] = acc

    grid = (N // ROWS, W // JBLK)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((ROWS, W), lambda i, j: (i, 0))],
        out_specs=pl.BlockSpec((ROWS, JBLK), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
    )(d0.astype(jnp.float32))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("use_pallas",))
def edt_l2(edge_mask: jnp.ndarray, use_pallas: bool = False) -> jnp.ndarray:
    """Exact Euclidean distance to the nearest True pixel of `edge_mask`.

    edge_mask: [..., H, W] bool. Pixels where the mask is True get 0.
    Matches scipy.ndimage.distance_transform_edt(~edge_mask).
    """
    d0 = _edt_pass1_columns(edge_mask)
    if use_pallas:
        *lead, H, W = d0.shape
        Np = _round_up(int(np.prod(lead, dtype=np.int64)) * H, 8)
        Wp = _round_up(W, 128)
        flat = d0.reshape(-1, W)
        flat = jnp.pad(flat, ((0, Np - flat.shape[0]), (0, Wp - W)),
                       constant_values=_INF)
        sq = _edt_pass2_rows_pallas(flat)[
            : int(np.prod(lead, dtype=np.int64)) * H, :W]
        sq = sq.reshape(*lead, H, W)
    else:
        sq = _edt_pass2_rows_xla(d0)
    return jnp.sqrt(jnp.minimum(sq, _INF ** 2))
