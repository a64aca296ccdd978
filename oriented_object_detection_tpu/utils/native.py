"""ctypes loader for the native host geometry library (native/geom.cpp).

Builds `libgeomobb.so` on first use (make -C native) and exposes
exact quad IoU matrices and greedy NMS to the host-side fusion/metrics
paths. Falls back to None when no toolchain is available — callers must
handle a None return and use the device path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "libgeomobb.so")
    # Always run make: it is a no-op when the .so is newer than geom.cpp,
    # and rebuilds a stale .so after source edits (a prebuilt binary must
    # never silently serve an old geometry algorithm). Concurrent
    # processes (parallel test runs) serialize on a lock file, and the
    # Makefile renames the .so into place atomically, so a half-written
    # library can never be dlopen'd. Only treat failure as fatal when no
    # .so exists at all — but warn when serving a stale one.
    try:
        import fcntl

        with open(os.path.join(_NATIVE_DIR, ".build.lock"), "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
    except Exception as e:
        if not os.path.exists(so):
            return None
        import sys

        # stderr: bench.py/detect stdout is a machine-readable contract
        print(f"[native] rebuild failed ({e!r}); using the EXISTING "
              f"{so} — it may predate local geom.cpp edits",
              file=sys.stderr)
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    try:
        _bind(lib)
    except AttributeError as e:
        # a stale prebuilt .so that predates newer symbols: honoring the
        # "callers handle None" contract beats crashing mid-fallback
        import sys

        print(f"[native] {so} is missing symbols ({e}); ignoring it — "
              "rebuild with `make -C native`", file=sys.stderr)
        return None
    _LIB = lib
    return _LIB


def _bind(lib):
    lib.quad_iou.restype = ctypes.c_double
    lib.quad_iou.argtypes = [ctypes.POINTER(ctypes.c_double)] * 2
    lib.quad_iou_matrix.restype = None
    lib.quad_iou_matrix.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double)]
    lib.greedy_nms.restype = ctypes.c_int
    lib.greedy_nms.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int)]
    lib.greedy_nms_grouped.restype = ctypes.c_int
    lib.greedy_nms_grouped.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_double, ctypes.POINTER(ctypes.c_int)]
    lib.consensus_filter.restype = ctypes.c_int
    lib.consensus_filter.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int)]
    lib.pr_match_multi.restype = None
    lib.pr_match_multi.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte)]


def available() -> bool:
    return _load() is not None


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def quad_iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray | None:
    """Exact pairwise IoU [n, m] in double precision; None if the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, dtype=np.float64).reshape(-1, 8)
    b = np.ascontiguousarray(b, dtype=np.float64).reshape(-1, 8)
    out = np.empty((len(a), len(b)), dtype=np.float64)
    if out.size:
        lib.quad_iou_matrix(_dp(a), len(a), _dp(b), len(b), _dp(out))
    return out


def greedy_nms(dets: np.ndarray, iou_thr: float) -> np.ndarray | None:
    """Greedy class-aware NMS over [n, 11] dets; returns kept indices in
    conf-descending order, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    d = np.ascontiguousarray(dets, dtype=np.float64).reshape(-1, 11)
    keep = np.empty(len(d), dtype=np.int32)
    cnt = lib.greedy_nms(_dp(d), len(d), float(iou_thr),
                         keep.ctypes.data_as(
                             ctypes.POINTER(ctypes.c_int)))
    return keep[:cnt]


def consensus_filter(dets: np.ndarray, scale_of: np.ndarray,
                     iou_partner: float, cons_low: float,
                     cons_high: float) -> np.ndarray | None:
    """Cross-scale consensus fusion (`Detect_OBB.py:347-423` semantics)
    over the CONS_LOW-prefiltered, scale-block-ordered [n, 11] rows.
    Returns kept row indices in discovery order, or None if
    unavailable."""
    lib = _load()
    if lib is None:
        return None
    d = np.ascontiguousarray(dets, dtype=np.float64).reshape(-1, 11)
    s = np.ascontiguousarray(scale_of, dtype=np.int32)
    keep = np.empty(len(d), dtype=np.int32)
    cnt = lib.consensus_filter(
        _dp(d), s.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(d),
        float(iou_partner), float(cons_low), float(cons_high),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:cnt]


def pr_match_multi(iou: np.ndarray,
                   iou_thrs: np.ndarray) -> np.ndarray | None:
    """Greedy det->GT matching for every IoU threshold at once over one
    image's [nd, ng] IoU block (det rows conf-descending). Returns TP
    flags [T, nd] (uint8), or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    m = np.ascontiguousarray(iou, dtype=np.float64)
    nd, ng = m.shape
    t = np.ascontiguousarray(iou_thrs, dtype=np.float64)
    out = np.zeros((len(t), nd), dtype=np.uint8)
    if nd and ng:
        lib.pr_match_multi(
            _dp(m), nd, ng, _dp(t), len(t),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    return out


def greedy_nms_grouped(dets: np.ndarray, group_ids: np.ndarray,
                       iou_thr: float) -> np.ndarray | None:
    """Per-group greedy class-aware NMS in ONE native call. `group_ids`
    must be contiguous runs (rows pre-sorted by group, conf-descending
    within each group). Returns kept indices in group order (conf-desc
    within group), or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    d = np.ascontiguousarray(dets, dtype=np.float64).reshape(-1, 11)
    g = np.ascontiguousarray(group_ids, dtype=np.int32)
    keep = np.empty(len(d), dtype=np.int32)
    cnt = lib.greedy_nms_grouped(
        _dp(d), g.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(d),
        float(iou_thr),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:cnt]
