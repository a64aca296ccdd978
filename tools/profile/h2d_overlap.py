"""Probe: does H2D overlap with device compute through the axon tunnel?

The large-map benchmark re-uploads ~50 MB per map through the
permanently-throttled ~35 MB/s H2D link (CLAUDE.md), serial with the
per-scale programs today. If transfers and programs overlap, a banded
pipeline (upload band k+1 while band k computes) would hide most of the
upload under compute. This probe measures, in the throttled regime:

  a) upload 50 MB alone (device_put + block)
  b) compute alone (chained matmuls on resident data, ~upload-scale time)
  c) dispatch compute THEN enqueue the upload, wait for both

overlap ratio = (a + b - c) / min(a, b):  ~1 full overlap, ~0 serial.

Usage: python tools/profile/h2d_overlap.py
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
    host = [rng.randint(0, 255, (4096, 4096, 3)).astype(np.uint8)
            for _ in range(4)]

    # compute: chained matmuls sized to roughly match the upload time
    a = jnp.asarray(rng.rand(4096, 4096), jnp.bfloat16)

    def make_chain(K):
        @jax.jit
        def f(x):
            for _ in range(K):
                x = jnp.tanh(x @ x) * 0.5
            return jnp.sum(x.astype(jnp.float32))
        return f

    f = make_chain(int(sys.argv[1]) if len(sys.argv) > 1 else 48)
    np.asarray(f(a))  # compile + enter the throttled-H2D regime

    def t_upload(h):
        t0 = time.time()
        d = jax.device_put(h)
        d.block_until_ready()
        dt = time.time() - t0
        del d
        return dt

    def t_compute():
        t0 = time.time()
        np.asarray(f(a))          # full D2H fetch forces real completion
        return time.time() - t0

    def t_both(h):
        t0 = time.time()
        r = f(a)                  # enqueue compute first
        d = jax.device_put(h)     # then the transfer
        np.asarray(r)
        d.block_until_ready()
        dt = time.time() - t0
        del d
        return dt

    def t_both_put_first(h):
        t0 = time.time()
        d = jax.device_put(h)
        r = f(a)
        np.asarray(r)
        d.block_until_ready()
        dt = time.time() - t0
        del d
        return dt

    up = [t_upload(h) for h in host]
    comp = [t_compute() for _ in range(4)]
    both = [t_both(h) for h in host]
    both_pf = [t_both_put_first(h) for h in host]

    u, c = float(np.median(up)), float(np.median(comp))
    b, bpf = float(np.median(both)), float(np.median(both_pf))
    print(f"upload 50MB alone : {u*1000:.0f} ms  {up}")
    print(f"compute alone     : {c*1000:.0f} ms  {comp}")
    print(f"compute->put      : {b*1000:.0f} ms  (serial would be "
          f"{(u+c)*1000:.0f})  {both}")
    print(f"put->compute      : {bpf*1000:.0f} ms  {both_pf}")
    for name, tot in (("compute->put", b), ("put->compute", bpf)):
        ratio = (u + c - tot) / max(min(u, c), 1e-9)
        print(f"overlap[{name}] = {ratio:.2f}  "
              f"({'overlaps' if ratio > 0.5 else 'mostly serial'})")


if __name__ == "__main__":
    main()
