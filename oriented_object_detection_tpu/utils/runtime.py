"""Runtime setup helpers."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 0.5) -> None:
    """Persistent XLA compilation cache — essential in this environment,
    where TPU compiles go through a remote-compile tunnel (tens of seconds
    per program); cached programs reload in milliseconds across
    processes."""
    import jax

    path = path or os.environ.get(
        "OODT_JAX_CACHE", os.path.join(os.path.expanduser("~"),
                                       ".cache", "oodt_jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)


def pack_tree(tree):
    """Pack a pytree of HOST arrays into one flat device buffer per dtype
    group + a static spec for in-graph unpacking.

    Through this box's TPU tunnel every individual transfer is a
    synchronous RPC and every extra program output costs one too: a
    checkpoint's few hundred param leaves take minutes leaf-by-leaf (and
    a standalone many-output unflatten program is just as bad — measured
    ~2 min/exec). The winning shape: ONE H2D per dtype, and the slicing
    happens INSIDE the consumer's jitted program via `unpack_tree`, where
    XLA fuses it into the first use for free.

    Returns (bufs, spec): bufs {dtype_str: device [N] array}; spec a
    hashable (treedef, per-leaf (dtype_str, offset, shape))."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(tree)
    host = [np.asarray(l) for l in leaves]
    offsets = {}
    per_leaf = []
    chunks: dict = {}
    for a in host:
        ds = a.dtype.str
        off = offsets.get(ds, 0)
        per_leaf.append((ds, off, a.shape))
        offsets[ds] = off + int(a.size)
        chunks.setdefault(ds, []).append(a.ravel())
    bufs = {
        ds: jnp.asarray(np.concatenate(parts) if len(parts) > 1
                        else parts[0])                 # ONE transfer each
        for ds, parts in chunks.items()
    }
    return bufs, (treedef, tuple(per_leaf))


def unpack_tree(bufs, spec):
    """Rebuild the pytree from packed buffers — call INSIDE a jitted
    program (the slices trace into the consumer and fuse away)."""
    treedef, per_leaf = spec
    leaves = []
    for ds, off, shape in per_leaf:
        n = 1
        for d in shape:
            n *= d
        leaves.append(bufs[ds][off:off + n].reshape(shape))
    import jax

    return jax.tree.unflatten(treedef, leaves)


def link_health_probe(h2d_mb: int = 16, rpc_reps: int = 5) -> dict:
    """Measure tunnel link health at run time (VERDICT r04 #7).

    The remote-device link varies ~2x day to day, so cross-round
    throughput numbers are not comparable without the run's own link
    measurements embedded in the artifact. Returns:

      * ``link_d2h_rpc_ms`` — median latency of a tiny device->host
        fetch (pure RPC round-trip; ~35-70 ms through the axon tunnel,
        ~0 ms on local devices). Distinct arrays per rep: jax caches a
        fetched Array's host value, so re-fetching one array is free.
      * ``link_h2d_mbps`` — effective host->device bandwidth for one
        ``h2d_mb``-MB upload, measured upload->tiny-dependent-fetch
        (block_until_ready only acks ENQUEUE through the tunnel) with
        the RPC latency subtracted. NOTE the box throttles H2D ~700 ->
        ~35 MB/s permanently after any large program executes — probe
        BEFORE the workload for fresh-link health, after for the
        throttled regime.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    # warm: materialize the backend + the trivial add program
    warm = jnp.zeros((4,), jnp.float32) + 1.0
    np.asarray(warm)

    small = [jnp.zeros((4,), jnp.float32) + float(i + 2)
             for i in range(rpc_reps)]
    for s in small:
        s.block_until_ready()
    lat = []
    for s in small:
        t0 = time.perf_counter()
        np.asarray(s)
        lat.append((time.perf_counter() - t0) * 1e3)
    rpc_ms = float(np.median(lat))

    buf = np.random.default_rng(0).integers(
        0, 255, (h2d_mb * 1024 * 1024,), np.uint8)
    t0 = time.perf_counter()
    dev = jnp.asarray(buf)
    # dependent fetch forces the upload to have completed
    np.asarray(dev[:4])
    dt = time.perf_counter() - t0 - rpc_ms / 1e3
    mbps = h2d_mb / max(dt, 1e-6)
    return {"link_d2h_rpc_ms": round(rpc_ms, 2),
            "link_h2d_mbps": round(float(mbps), 1)}
