"""Isolated dt_edge_channel timing at production batch shape, Pallas vs
chunked-XLA EDT, plus what default_use_pallas() resolves to on this box.
Chained-K device timing (one program, marker fetch)."""
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

    print("default_backend:", jax.default_backend())
    print("default_use_pallas():", DT.default_use_pallas())

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 255, (128, 416, 416, 3)).astype(np.uint8))

    for up in (True, False):
        fn = jax.jit(lambda a, up=up: DT.dt_edge_channel(a, use_pallas=up))
        r = fn(x)
        np.asarray(r)  # compile + run
        tick = jax.jit(lambda s: s + 1.0)
        np.asarray(tick(jnp.float32(0.0)))
        n = 5
        t0 = time.time()
        for i in range(n):
            np.asarray(tick(jnp.float32(i)))
        base = (time.time() - t0) / n
        t0 = time.time()
        for i in range(n):
            fn(x)
            np.asarray(tick(jnp.float32(i)))
        dt = (time.time() - t0) / n - base
        print(f"use_pallas={up}: dt_edge_channel[128,416] "
              f"~{dt * 1000:.1f} ms ({dt / 128 * 1e3:.2f} ms/tile)")


if __name__ == "__main__":
    main()
