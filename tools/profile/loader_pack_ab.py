"""Same-process A/B of the loader's per-batch upload layout on TPU.

OLD (pre-37361f0): the device-mosaic batch shipped ~14 separate host
arrays per step (tile idxs, mosaic center, 4 warp tables, flags, HSV
gains, gt box/label/mask). Each H2D through this box's tunnel costs
~35-70 ms RPC latency regardless of size, so the layout alone cost
~0.5-0.7 s per training step. NEW: everything rides in ONE int32 pack +
ONE float32 pack (`loader._mosaic_batch_packed_fn`).

Both variants execute the SAME traced compute body on identical data;
per-rep the two variants run back to back (interleaved pairs) so link
weather cancels — only compare within one run. Each rep syncs with a
single tiny D2H fetch (35-70 ms RPC, identical for both variants).

Usage (TPU, run alone): python tools/profile/loader_pack_ab.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(ts=416, C=3, B=16, M=16, reps=7):
    import jax.numpy as jnp

    from oriented_object_detection_tpu.data import loader as L
    from oriented_object_detection_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    N = 64
    cache = jnp.asarray(rng.randint(0, 255, (N, ts, ts, C), np.uint8))

    old = L._mosaic_batch_fn(ts, C)            # jitted 13-arg program
    new = L._mosaic_batch_packed_fn(ts, C, M)  # jitted 2-pack program
    o = 6 + 4 * ts

    def host_batch(r):
        """Distinct per-rep host arrays (no device-put dedup hazards)."""
        g = np.random.RandomState(100 + r)
        h = {
            "idxs": g.randint(0, N, (B, 4)).astype(np.int32),
            "yc": g.randint(ts // 2, 3 * ts // 2, B).astype(np.int32),
            "xc": g.randint(ts // 2, 3 * ts // 2, B).astype(np.int32),
            "wtab": g.randint(-2 ** 20, 2 ** 20,
                              (B, 4, ts)).astype(np.int32),
            "is_mos": g.rand(B) < 0.8,
            "gb": g.uniform(0, ts, (B, M, 5)).astype(np.float32),
            "flips": g.rand(B) < 0.5,
            "sg": g.uniform(0.6, 1.4, B).astype(np.float32),
            "vg": g.uniform(0.6, 1.4, B).astype(np.float32),
            "gl": g.randint(0, 12, (B, M)).astype(np.int32),
            "gm": g.rand(B, M) < 0.6,
        }
        return h

    def run_old(h):
        x, gb = old(cache, jnp.asarray(h["idxs"]), jnp.asarray(h["yc"]),
                    jnp.asarray(h["xc"]), jnp.asarray(h["wtab"][:, 0]),
                    jnp.asarray(h["wtab"][:, 1]),
                    jnp.asarray(h["wtab"][:, 2]),
                    jnp.asarray(h["wtab"][:, 3]),
                    jnp.asarray(h["is_mos"]), jnp.asarray(h["gb"]),
                    jnp.asarray(h["flips"]), jnp.asarray(h["sg"]),
                    jnp.asarray(h["vg"]))
        gl, gm = jnp.asarray(h["gl"]), jnp.asarray(h["gm"])
        return x, gb, gl, gm

    def run_new(h):
        ipack = np.zeros((B, o + 2 + 2 * M), np.int32)
        ipack[:, 0:4] = h["idxs"]
        ipack[:, 4] = h["yc"]
        ipack[:, 5] = h["xc"]
        ipack[:, 6:o] = h["wtab"].reshape(B, 4 * ts)
        ipack[:, o] = h["is_mos"]
        ipack[:, o + 1] = h["flips"]
        ipack[:, o + 2:o + 2 + M] = h["gl"]
        ipack[:, o + 2 + M:] = h["gm"]
        fpack = np.empty((B, 5 * M + 2), np.float32)
        fpack[:, :5 * M] = h["gb"].reshape(B, 5 * M)
        fpack[:, 5 * M] = h["sg"]
        fpack[:, 5 * M + 1] = h["vg"]
        return new(cache, jnp.asarray(ipack), jnp.asarray(fpack))

    # compile + parity check on identical data
    h0 = host_batch(0)
    a = run_old(h0)
    b = run_new(h0)
    for va, vb, name in [(a[0], b[0], "images"), (a[1], b[1], "gt")]:
        assert (np.asarray(va) == np.asarray(vb)).all(), name
    print("[ab] parity ok (bit-identical images + gt)")

    t_old, t_new = [], []
    for r in range(1, reps + 1):
        h = host_batch(r)
        t0 = time.time()
        x, *_ = run_old(h)
        np.asarray(x[0, 0, 0, 0])             # one tiny sync fetch
        t_old.append(time.time() - t0)
        t0 = time.time()
        x, *_ = run_new(h)
        np.asarray(x[0, 0, 0, 0])
        t_new.append(time.time() - t0)
        print(f"[ab] rep {r}: old {t_old[-1]*1e3:.0f} ms  "
              f"new {t_new[-1]*1e3:.0f} ms")
    mo, mn = np.median(t_old), np.median(t_new)
    print(f"[ab] median/batch ts={ts} B={B}: old {mo*1e3:.0f} ms, "
          f"new {mn*1e3:.0f} ms, speedup {mo/mn:.2f}x")


if __name__ == "__main__":
    main()
