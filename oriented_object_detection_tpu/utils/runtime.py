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
