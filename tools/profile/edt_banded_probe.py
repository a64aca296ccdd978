"""Probe: is a statically-banded XLA pass 2 worth it at tile widths?

VERDICT (2026-08-17, 1x v5e, [128,416,416] GeoMap-like tiles): NO.
Production content has blank regions, so only 47% / 82% / 95% of pixels
fall within B=32/64/96 bands — the exactness fallback always fires and
banded+fallback (25-32 ms) loses to the plain brute (19.6 ms). This
confirms the shape-aware pick in ops/dtedge.py from the content side:
at tile widths the O(W^2) XLA brute is the right exact kernel.

At [128, 416, 416] the production EDT uses the chunked-XLA O(W^2) brute
(shape-aware pick; the banded Pallas kernel loses to it there). A
statically-banded XLA min-plus only evaluates k in [j-B, j+B] — a
contiguous window per output chunk, so it stays one dynamic_slice per
chunk — and is provably exact wherever the result d^2 <= B^2 (argmin
obeys |j-k*| <= D(j)); a global lax.cond falls back to the full brute
when any pixel exceeds the band. This probe times, chained-K on device:
  pass1 (columns), pass2 brute, pass2 banded B=32/64, full channel,
and checks the banded result + fallback exactness on production-like
and adversarial (empty-edge) masks.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from oriented_object_detection_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()

    from oriented_object_detection_tpu.ops import dtedge as DT
    from oriented_object_detection_tpu.ops import edt as E

    INF = 1e30

    def pass2_banded(d0, B, chunk=32):
        f = jnp.minimum(d0, INF) ** 2
        W = f.shape[-1]
        pad_r = (-W) % chunk
        fp = jnp.pad(f, [(0, 0)] * (f.ndim - 1) + [(B, B + pad_r)],
                     constant_values=INF)
        nchunks = (W + pad_r) // chunk
        k_rel = jnp.arange(chunk + 2 * B, dtype=jnp.float32) - B
        j_loc = jnp.arange(chunk, dtype=jnp.float32)
        para = (j_loc[:, None] - k_rel[None, :]) ** 2

        def one_chunk(c):
            win = jax.lax.dynamic_slice_in_dim(
                fp, c * chunk, chunk + 2 * B, axis=-1)
            return jnp.min(win[..., None, :] + para, axis=-1)

        out = jax.lax.map(one_chunk, jnp.arange(nchunks))
        out = jnp.moveaxis(out, 0, -2)
        return out.reshape(*f.shape[:-1], nchunks * chunk)[..., :W]

    def pass2_banded_exact(d0, B, chunk=32):
        banded = pass2_banded(d0, B, chunk)
        ok = jnp.all(banded <= jnp.float32(B) ** 2)
        return jax.lax.cond(ok, lambda: banded,
                            lambda: E._edt_pass2_rows_xla(d0, chunk))

    rng = np.random.RandomState(0)
    # production-like: per-tile percentile binarization -> ~10% edges
    from tools.train_synthetic import gen_map
    tiles = np.stack([
        gen_map(rng, H=416, W=416, n_obj=12)[0] for _ in range(8)])
    x = jnp.asarray(np.tile(tiles, (16, 1, 1, 1)))  # [128, 416, 416, 3]
    from oriented_object_detection_tpu.config import DTEdgeConfig
    cfgd = DTEdgeConfig()

    @jax.jit
    def edge_masks(a):
        gray = DT.bgr_to_gray_u8(a)
        acc = DT.multi_scale_scharr(gray, cfgd.sigmas)
        e = DT.binarize_percentile(acc, cfgd.p_hi)
        return DT.morph_open_cross(e, cfgd.morph_open)

    edges = edge_masks(x)

    d0 = jax.jit(E._edt_pass1_columns)(edges)
    print("pass1 d0 max:", float(jnp.max(jnp.minimum(d0, 1e9))))

    def chain_time(fn, x, K=8):
        def dep(a, acc):
            if a.dtype == jnp.bool_:
                return jnp.logical_xor(a, acc > 1e30)
            return a + (acc > 1e30).astype(a.dtype)

        def chained(a):
            acc = jnp.zeros((), jnp.float32)
            for i in range(K):
                r = fn(dep(a, acc))
                acc = acc + jnp.sum(r[..., 7, 3].astype(jnp.float32))
            return acc
        f1 = jax.jit(lambda a: fn(a).sum())
        fK = jax.jit(chained)
        np.asarray(f1(x)); np.asarray(fK(x))
        t1 = np.median([_t(lambda: np.asarray(f1(x))) for _ in range(3)])
        tK = np.median([_t(lambda: np.asarray(fK(x))) for _ in range(3)])
        return (tK - t1) / (K - 1)

    def _t(fn):
        t0 = time.time()
        fn()
        return time.time() - t0

    brute = jax.jit(E._edt_pass2_rows_xla)
    ref = np.asarray(brute(d0))
    for B in (32, 64, 96):
        got = np.asarray(jax.jit(
            lambda a, B=B: pass2_banded_exact(a, B))(d0))
        exact = np.array_equal(got, ref)
        frac_in = float((ref <= B * B).mean())
        t = chain_time(lambda a, B=B: pass2_banded_exact(a, B), d0)
        print(f"banded B={B}: exact={exact} frac_within_band={frac_in:.4f}"
              f" time={t*1000:.2f} ms")
    t_brute = chain_time(E._edt_pass2_rows_xla, d0)
    t_p1 = chain_time(E._edt_pass1_columns, edges)
    print(f"pass2 brute: {t_brute*1000:.2f} ms  pass1: {t_p1*1000:.2f} ms")

    # adversarial: one empty-edge tile forces the fallback branch
    e2 = np.array(edges)  # writable copy
    e2[0] = False
    d0_adv = jax.jit(E._edt_pass1_columns)(jnp.asarray(e2))
    got = np.asarray(jax.jit(lambda a: pass2_banded_exact(a, 64))(d0_adv))
    ref2 = np.asarray(brute(d0_adv))
    print("adversarial exact:", np.array_equal(got, ref2))

    t_chan = chain_time(
        lambda a: DT.dt_edge_channel(a, use_pallas=False), x, K=4)
    print(f"dt_edge_channel full (XLA): {t_chan*1000:.2f} ms "
          f"({t_chan/128*1e6:.0f} us/tile)")


if __name__ == "__main__":
    main()
