"""Exact Euclidean distance transform (L2 EDT), batched, TPU-native.

Replaces `cv2.distanceTransform(non_edge, DIST_L2, 3)` in the DT-Edge
channel (`Detect_OBB.py:121`, `Train_OBB.py:645`). Note the reference's
maskSize=3 variant is the Borgefors *chamfer approximation* (weights
0.955/1.3693); this implementation computes the exact EDT via the classic
two-pass separable decomposition:

  pass 1 (columns): d0[i,j] = min_k { |i-k| : mask[k,j] == 0 }
      — log-step-doubling running-min (exact, see `_edt_pass1_columns`).
  pass 2 (rows):    D[i,j]  = sqrt( min_k d0[i,k]^2 + (j-k)^2 )
      — a min-plus against the parabola family, implemented as a BANDED
        shift-space Pallas TPU kernel: since sqrt(a^2+b^2) <= a+b, a
        cheap per-strip radius bound R proves the argmin satisfies
        |j - k*| <= R, so the kernel only scans offsets delta in [-R, R]
        with out[j] = min(out[j], f2[j+delta] + delta^2) — one [8, W]
        vector op per offset against an INF-padded VMEM scratch. Total
        work is O(W * R): near-linear on dense-edge map imagery (R is
        tens of pixels), degrading gracefully to O(W^2) with a tiny
        constant on pathological empty images. A chunked pure-XLA brute
        force remains as the CPU/debug fallback.

Exactness: the band provably contains the true argmin, so the banded
kernel still computes the exact lower envelope and the result equals
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


def _edt_pass1_columns_pallas(edge_i32: jnp.ndarray) -> jnp.ndarray:
    """Pallas pass 1: same log-step doubling as `_edt_pass1_columns`,
    but each (image, 128-column block) runs entirely in VMEM with static
    SUBLANE rolls — the XLA version materializes ~6 full-array HBM
    traversals per round x ceil(log2 H) rounds (measured 7 ms of the
    10 ms total 4096^2 EDT; ~1 ms here).

    edge_i32: [B, H, W] int32 (nonzero = edge; int32 because Mosaic
    supports neither u8->f32 casts nor i1 vector relayouts here).
    Returns float32 [B, H, W] vertical distances capped at _INF. H
    capped by VMEM (~2 MB per 128-col block at 4096); callers fall back
    to XLA beyond."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W = edge_i32.shape
    CB = 128

    def kernel(e_ref, out_ref):
        # everything in float arithmetic: bool (i1) vectors trip Mosaic
        # relayout errors here ("non-singleton logical dimension is
        # replicated in destination"), so the seed map and the circular
        # wrap masks are built from min/max/clamp instead of compares
        e = jnp.minimum(e_ref[0], 1)                     # i32: 0 or 1
        d = (1 - e).astype(jnp.float32) * _INF
        # int iota + cast: Mosaic cannot lower a float iota directly
        fi = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0) \
            .astype(jnp.float32)
        s = 1
        while s < H:
            # static roll requires a non-negative shift: -s mod H
            up = pltpu.roll(d, H - s, 0)     # row i <- d[(i+s) % H]
            down = pltpu.roll(d, s, 0)       # row i <- d[(i-s) % H]
            # wrap masks: rows whose source wrapped get +INF
            m_up = jnp.clip(fi - float(H - s - 1), 0.0, 1.0) * _INF
            m_dn = jnp.clip(float(s) - fi, 0.0, 1.0) * _INF
            up = up + float(s) + m_up
            down = down + float(s) + m_dn
            d = jnp.minimum(d, jnp.minimum(up, down))
            s *= 2
        out_ref[0] = jnp.minimum(d, _INF)

    grid = (B, pl.cdiv(W, CB))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, H, CB), lambda b, c: (b, 0, c))],
        out_specs=pl.BlockSpec((1, H, CB), lambda b, c: (b, 0, c)),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
    )(edge_i32)


# H beyond this blows the 16 MB scoped-VMEM budget of the Pallas pass-1
# kernel (the unrolled log2(H) rounds keep ~5 [H, 128] f32 temporaries
# live, plus the pipeline's double buffers: H=4096 measured 20 MB and
# failed to compile); taller images fall back to the XLA doubling
# (~7 ms at 4096^2 — minor next to that shape's pass 2 + percentiles)
_PASS1_PALLAS_MAX_H = 2048


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


_ROWS = 8        # rows per grid cell at map widths (tight band)
_ROWS_TILE = 128  # rows per grid cell at tile widths (amortize dispatch)
_GRP = 8   # column decimation for the band-radius bound


def _band_radius(d0: jnp.ndarray, real_w: int,
                 rows_per_cell: int = _ROWS) -> jnp.ndarray:
    """Per-strip band radius R that provably contains every pass-2 argmin.

    Since sqrt(a^2 + b^2) <= a + b, the true distance obeys
    D(j) <= d0[k] + |j - k| for every k, so the argmin k* satisfies
    |j - k*| <= D(j) <= that bound. Computed at _GRP-column granularity:
    with g8[row, g] = min over group g's columns of d0, the exact
    group-level L1 envelope
        U8[row, g] = min_h ( g8[row, h] + _GRP * |g - h| )
    (log-step-doubling min-plus, same exactness argument as pass 1)
    bounds D(j) <= U8[g(j)] + (_GRP - 1) for every j in group g. The
    strip radius is the max over the strip's rows and groups. Cost: a
    W/_GRP-wide doubling — ~1/_GRP of a full-resolution envelope and
    microseconds next to pass 2 itself; granularity costs at most
    2*(_GRP-1) extra scan offsets per strip.

    Groups made entirely of INF-padded columns (g >= ceil(real_w/_GRP))
    are EXCLUDED from the strip max: their envelope value is their
    distance to the nearest real column, which would inflate every
    strip's radius by up to the pad width (measured 8x pass-2 blowup on
    416->512-padded tiles); their outputs are sliced away by the caller
    anyway, and dropping pad-k candidates is sound because their f = INF
    never wins for real j.

    d0: [N, W] (N % rows_per_cell == 0, W % _GRP == 0); real_w: count of
    real (non-pad) columns. Returns int32 [N // rows_per_cell]."""
    N, W = d0.shape
    S, G = N // rows_per_cell, W // _GRP
    u = jnp.minimum(d0, _INF).reshape(N, G, _GRP).min(axis=2)  # [N, G]
    s = 1
    while s < G:
        inf_pad = jnp.full((N, s), _INF, jnp.float32)
        left = jnp.concatenate([u[:, s:], inf_pad], axis=1) + float(s * _GRP)
        right = jnp.concatenate([inf_pad, u[:, :-s]], axis=1) \
            + float(s * _GRP)
        u = jnp.minimum(u, jnp.minimum(left, right))
        s *= 2
    g_real = -(-real_w // _GRP)
    u = u[:, :g_real]
    r = u.reshape(S, rows_per_cell * g_real).max(axis=1) + float(_GRP - 1)
    # +1 for the ceil; clip to W so INF never overflows int32
    return jnp.minimum(r + 1.0, float(W)).astype(jnp.int32)


def _edt_pass2_rows_pallas(d0: jnp.ndarray, radius: jnp.ndarray,
                           real_w: int,
                           rows_per_cell: int = _ROWS) -> jnp.ndarray:
    """Banded shift-space Pallas TPU kernel for pass 2.

    d0: [N, W] vertical distances (rows flattened); radius: int32
    [N // rows_per_cell] per-cell band radii from `_band_radius`; real_w:
    count of real (non-INF-pad) columns, used to mask pads out of the
    early-exit max. Returns squared distances [N, W]. W must be a
    multiple of 128, N of rows_per_cell (itself a multiple of 8).

    One grid cell per rows_per_cell-row block. A dynamic-bound loop scans
    offsets delta in [-R, R] with a dynamic CIRCULAR lane roll
    (tpu.dynamic_rotate — Mosaic cannot do unaligned dynamic vector
    loads, but dynamic rolls are native):
        out = min(out, where(0 <= j+delta < W, roll(f^2, -delta) +
                             delta^2, INF))
    — a handful of [rows_per_cell, W] vector ops per offset, no 3-D
    broadcasts, no per-j-block grid overhead; the mask kills wrapped
    lanes so edge handling is free.

    rows_per_cell trades grid-dispatch overhead (~2 us/cell) against
    band looseness (the radius and the early-exit bound are maxima over
    the whole cell): at map widths (W >= 1024) the per-offset vector work
    amortizes the dispatch, so 8-row strips keep the band tight; at tile
    widths an [8, 512] strip's band loop is ~1 us of vector work and the
    grid dispatch DOMINATED (measured 1.44 ms/tile vs 0.33 for the XLA
    brute at [128, 416, 416] with 8-row cells) — 128-row cells put ~3
    cells per 416 tile and the dispatch disappears into the loop."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, W = d0.shape
    INFSQ = _INF * _INF

    def kernel(r_ref, f_ref, out_ref):
        s = pl.program_id(0)
        fsq = jnp.minimum(f_ref[...], _INF) ** 2
        jidx = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        r = r_ref[s]
        out_ref[...] = fsq                      # delta = 0 candidate

        # scan outward (0, +1, -1, +2, -2, ...) and stop as soon as
        # delta^2 exceeds the strip's current max over REAL columns: no
        # remaining offset can improve any real pixel then. This shrinks
        # the scan from the sqrt(2)-loose L1 radius bound toward the
        # strip's TRUE max distance (a stale max only over-scans, never
        # under-scans). The INF-padded columns are masked out of the max
        # — their outputs converge to >= (pad width)^2, which kept the
        # exit from ever firing on non-x128 widths (416 -> 512 pad). The
        # max-reduce is refreshed only every 16 offsets — feeding it into
        # every cond serializes the loop and doubled the runtime on
        # large-radius strips.
        real = jidx < real_w                    # [1, W]

        def mag(i):
            return (i + 1) // 2

        def cond(carry):
            i, maxout = carry
            m = mag(i).astype(jnp.float32)
            return (i < 2 * r + 1) & (m * m <= maxout)

        def body(carry):
            i, maxout = carry
            delta = jnp.where(i % 2 == 1, mag(i), -mag(i))
            df = delta.astype(jnp.float32)
            rolled = pltpu.roll(fsq, -delta, 1)  # j <- f^2[(j+delta)%W]
            src = jidx + delta
            valid = (src >= 0) & (src < W)
            cand = jnp.where(valid, rolled + df * df, INFSQ)
            out_ref[...] = jnp.minimum(out_ref[...], cand)
            maxout = jax.lax.cond(
                (i + 1) % 16 == 0,
                lambda: jnp.max(jnp.where(real, out_ref[...], 0.0)),
                lambda: maxout)
            return i + 1, maxout

        jax.lax.while_loop(
            cond, body, (1, jnp.max(jnp.where(real, fsq, 0.0))))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // rows_per_cell,),
        in_specs=[pl.BlockSpec((rows_per_cell, W), lambda s, r: (s, 0))],
        out_specs=pl.BlockSpec((rows_per_cell, W), lambda s, r: (s, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
    )(radius, d0.astype(jnp.float32))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("use_pallas",))
def edt_l2(edge_mask: jnp.ndarray, use_pallas: bool = False) -> jnp.ndarray:
    """Exact Euclidean distance to the nearest True pixel of `edge_mask`.

    edge_mask: [..., H, W] bool. Pixels where the mask is True get 0.
    Matches scipy.ndimage.distance_transform_edt(~edge_mask).
    """
    if use_pallas:
        *lead, H, W = edge_mask.shape
        if H <= _PASS1_PALLAS_MAX_H:
            d0 = _edt_pass1_columns_pallas(
                edge_mask.astype(jnp.int32).reshape(-1, H, W)
            ).reshape(*edge_mask.shape)
        else:
            d0 = _edt_pass1_columns(edge_mask)
        Wp = _round_up(W, 128)
        # rows per grid cell: 8-row strips keep the band tight at map
        # widths; tile widths need big cells or grid dispatch dominates
        # (see _edt_pass2_rows_pallas)
        rpc = _ROWS if Wp >= 1024 else _ROWS_TILE
        Np = _round_up(int(np.prod(lead, dtype=np.int64)) * H, rpc)
        flat = d0.reshape(-1, W)
        # pad COLUMNS with INF (those k must never win for real j); pad
        # ROWS with 0 (rows are independent and the pads are discarded —
        # 0 keeps the trailing strip's band loop trivial)
        flat = jnp.pad(flat, ((0, 0), (0, Wp - W)), constant_values=_INF)
        flat = jnp.pad(flat, ((0, Np - flat.shape[0]), (0, 0)),
                       constant_values=0.0)
        sq = _edt_pass2_rows_pallas(flat, _band_radius(flat, W, rpc), W,
                                    rpc)[
            : int(np.prod(lead, dtype=np.int64)) * H, :W]
        sq = sq.reshape(*lead, H, W)
    else:
        sq = _edt_pass2_rows_xla(_edt_pass1_columns(edge_mask))
    return jnp.sqrt(jnp.minimum(sq, _INF ** 2))
