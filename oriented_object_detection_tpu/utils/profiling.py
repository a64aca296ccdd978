"""Tracing / profiling hooks.

The reference's only observability is wall-clock prints
(`Detect_OBB.py:74, 269, 293, 755`). Here:

* `timed(name)` — context-manager stage timer feeding a global registry
  (tile gather / forward / NMS / fusion / export breakdowns);
* `trace(dir)` — wraps `jax.profiler.trace` for XLA/TPU traces viewable in
  TensorBoard/Perfetto;
* `report()` — per-stage totals, call counts, means.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

_STAGES: dict[str, list[float]] = defaultdict(list)
_ENABLED = True


def enable(on: bool = True):
    global _ENABLED
    _ENABLED = on


def reset():
    _STAGES.clear()


@contextlib.contextmanager
def timed(name: str):
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _STAGES[name].append(time.perf_counter() - t0)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """XLA profiler trace (TensorBoard/Perfetto viewable)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


def report() -> dict[str, dict]:
    out = {}
    for name, times in sorted(_STAGES.items()):
        out[name] = {
            "calls": len(times),
            "total_s": sum(times),
            "mean_ms": sum(times) / len(times) * 1000.0,
        }
    return out


def print_report():
    rep = report()
    if not rep:
        return
    width = max(len(k) for k in rep)
    print(f"{'stage'.ljust(width)}  calls  total(s)  mean(ms)")
    for k, v in rep.items():
        print(f"{k.ljust(width)}  {v['calls']:5d}  {v['total_s']:8.3f}"
              f"  {v['mean_ms']:8.2f}")
