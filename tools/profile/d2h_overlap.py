"""Probe: does an async D2H fetch overlap with device compute through
the axon tunnel?

detect_stream's per-chunk fetch (np.asarray on the packed rows) blocks
BEFORE the next chunk's programs are dispatched, so fetch time is serial
with compute today. If `Array.copy_to_host_async()` genuinely overlaps a
subsequently dispatched program, the stream could start the fetch, then
dispatch chunk k+1, then block — hiding (fetch - RPC) under compute in
fetch-bound regimes (metrics-mode packs with small uploads). The sibling
probe tools/profile/h2d_overlap.py answered the H2D side (compute->put
overlaps; put->compute serializes).

Measures, after entering the throttled regime:
  a) fetch alone: one ~64 MB device->host of a resident array
  b) compute alone: chained matmuls (~fetch-scale time)
  c) async-fetch THEN dispatch compute, wait for both
  d) dispatch compute THEN async-fetch, wait for both

overlap ratio = (a + b - c) / min(a, b): ~1 full overlap, ~0 serial.

Usage: python tools/profile/d2h_overlap.py [chain_K]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from oriented_object_detection_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)

    # the fetch subject: ~64 MB resident array, refreshed per rep so the
    # runtime cannot serve a cached host copy
    @jax.jit
    def make(x):
        return x + 1.0

    a = jnp.asarray(rng.rand(4096, 4096), jnp.bfloat16)

    def make_chain(K):
        @jax.jit
        def f(x):
            for _ in range(K):
                x = jnp.tanh(x @ x) * 0.5
            return jnp.sum(x.astype(jnp.float32))
        return f

    f = make_chain(int(sys.argv[1]) if len(sys.argv) > 1 else 48)
    big = make(jnp.zeros((4096, 4096), jnp.float32))
    np.asarray(f(a))          # compile + enter the throttled regime
    np.asarray(big[:8, :8])

    def t_fetch():
        t0 = time.time()
        np.asarray(big)
        return time.time() - t0

    def t_compute():
        t0 = time.time()
        np.asarray(f(a))
        return time.time() - t0

    def t_fetch_then_compute():
        t0 = time.time()
        big.copy_to_host_async()
        r = f(a)
        np.asarray(big)
        np.asarray(r)
        return time.time() - t0

    def t_compute_then_fetch():
        t0 = time.time()
        r = f(a)
        big.copy_to_host_async()
        np.asarray(r)
        np.asarray(big)
        return time.time() - t0

    fe = [t_fetch() for _ in range(5)]
    co = [t_compute() for _ in range(5)]
    fc = [t_fetch_then_compute() for _ in range(5)]
    cf = [t_compute_then_fetch() for _ in range(5)]

    u, c = float(np.median(fe)), float(np.median(co))
    print(f"fetch 64MB alone  : {u*1000:.0f} ms  {[round(t,2) for t in fe]}")
    print(f"compute alone     : {c*1000:.0f} ms  {[round(t,2) for t in co]}")
    for name, arr in (("fetch->compute", fc), ("compute->fetch", cf)):
        tot = float(np.median(arr))
        ratio = (u + c - tot) / max(min(u, c), 1e-9)
        print(f"{name}    : {tot*1000:.0f} ms (serial would be "
              f"{(u+c)*1000:.0f})  overlap={ratio:.2f} "
              f"({'overlaps' if ratio > 0.5 else 'mostly serial'})")


if __name__ == "__main__":
    main()
