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
