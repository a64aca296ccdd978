"""Torch-free reader for torch zip-serialized checkpoints (`.pt`).

The reference serves fine-tuned ultralytics checkpoints
(`/root/reference/Detect_OBB.py:26`, `Train_OBB.py:792`; published on
Google Drive, `/root/reference/README.md:183-188`). Those files are torch
zip archives whose pickle stream references ultralytics classes, so even
`torch.load(weights_only=True)` refuses them and a full unpickle needs
torch AND ultralytics installed — neither belongs in this framework's
deployment footprint.

This module reads the format directly:

* a `.pt` is a zip: `<name>/data.pkl` (pickle program), `<name>/data/<k>`
  (raw little-endian storage bytes, one entry per tensor storage),
  `<name>/version`, optionally `<name>/byteorder`.
* tensor storages are pickled via `persistent_id` tuples
  `('storage', <StorageType>, key, location, numel)`; tensors are rebuilt
  by `torch._utils._rebuild_tensor_v2(storage, offset, size, stride, ...)`.
* every OTHER global (ultralytics modules, torch nn layers, argparse
  Namespace, ...) is resolved to an inert generic stub class that only
  records its constructor args / `__setstate__` state — **no code from
  the checkpoint is ever executed**, which makes this strictly safer than
  `torch.load(weights_only=False)`.

The stubbed object graph still contains everything needed to extract the
module's state dict: `nn.Module` pickles by `__dict__`, so the stubs
carry `_parameters` / `_buffers` / `_modules` dicts whose tensor leaves
were materialized as numpy arrays by the `_rebuild_tensor*` handlers.
"""

from __future__ import annotations

import pickle
import zipfile
from collections import OrderedDict
from typing import Dict

import numpy as np

# torch storage class name -> numpy dtype of the raw bytes in data/<key>
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
    "UntypedStorage": np.dtype("<u1"),
}
try:  # bf16 storages: numpy has no bf16; ml_dtypes ships with jax
    import ml_dtypes

    _STORAGE_DTYPES["BFloat16Storage"] = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover - ml_dtypes is a jax dependency
    pass

# real globals the pickle stream may legitimately need. numpy arrays
# (e.g. ultralytics stores class-name arrays / metrics) reconstruct
# through these; everything else gets a stub.
_SAFE_GLOBALS = {
    ("collections", "OrderedDict"): OrderedDict,
    ("numpy", "ndarray"): np.ndarray,
    ("numpy", "dtype"): np.dtype,
}
# the private numpy reconstruct helpers moved in numpy 2
# (numpy.core -> numpy._core); map BOTH pickle spellings to whichever
# implementation this numpy provides
try:  # pragma: no cover - depends on numpy version
    from numpy._core import multiarray as _ma
except Exception:  # pragma: no cover
    from numpy.core import multiarray as _ma
for _mod in ("numpy.core.multiarray", "numpy._core.multiarray"):
    _SAFE_GLOBALS[(_mod, "_reconstruct")] = _ma._reconstruct
    _SAFE_GLOBALS[(_mod, "scalar")] = _ma.scalar
import collections as _collections

_SAFE_GLOBALS[("collections", "defaultdict")] = _collections.defaultdict
for _b in ("set", "frozenset", "complex", "bytearray", "range", "slice"):
    _SAFE_GLOBALS[("builtins", _b)] = getattr(__import__("builtins"), _b)


class _StorageType:
    """Marker for `torch.<X>Storage` globals inside persistent ids."""

    def __init__(self, name: str):
        self.name = name
        self.dtype = _STORAGE_DTYPES.get(name)


class _Storage:
    """Lazy view of one `data/<key>` zip entry as a 1-D numpy array."""

    def __init__(self, zf: zipfile.ZipFile, entry: str, dtype: np.dtype,
                 numel: int):
        self._zf, self._entry = zf, entry
        self.dtype, self.numel = dtype, numel
        self._arr = None

    def array(self) -> np.ndarray:
        if self._arr is None:
            raw = self._zf.read(self._entry)
            self._arr = np.frombuffer(raw, self.dtype)
        return self._arr


class _Stub:
    """Inert placeholder for any global the restricted unpickler does not
    recognize. Records constructor args and pickled state; never runs
    any checkpoint-supplied code."""

    _qualname = "?"

    def __new__(cls, *args, **kwargs):  # NEWOBJ passes ctor args here
        return object.__new__(cls)

    def __init__(self, *args, **kwargs):
        self._stub_args = args
        self._stub_kwargs = kwargs

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif isinstance(state, tuple) and len(state) == 2:
            d, slots = state
            if isinstance(d, dict):
                self.__dict__.update(d)
            if isinstance(slots, dict):
                self.__dict__.update(slots)
        else:
            self.__dict__["_stub_state"] = state

    def __call__(self, *args, **kwargs):
        # a stubbed function/class used as a factory in REDUCE: return
        # another stub carrying the call
        out = _Stub()
        out.__dict__["_stub_call"] = (self._qualname, args, kwargs)
        return out

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"<stub {self._qualname}>"


def _rebuild_tensor_v2(storage: _Storage, offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None) -> np.ndarray:
    """`torch._utils._rebuild_tensor_v2` without torch: strided view of
    the raw storage, materialized contiguous."""
    arr = storage.array()
    size, stride = tuple(size), tuple(stride)
    flat = arr[offset:]
    strides = tuple(int(s) * arr.itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(flat, shape=size,
                                           strides=strides)
    # .copy() (not ascontiguousarray) — the latter promotes 0-d to (1,)
    return view.copy()


def _rebuild_tensor(storage, offset, size, stride):
    return _rebuild_tensor_v2(storage, offset, size, stride)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


def _rebuild_parameter_with_state(data, requires_grad, hooks, state):
    return data


_REBUILDERS = {
    "_rebuild_tensor_v2": _rebuild_tensor_v2,
    "_rebuild_tensor": _rebuild_tensor,
    "_rebuild_parameter": _rebuild_parameter,
    "_rebuild_parameter_with_state": _rebuild_parameter_with_state,
}


class _RestrictedUnpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix
        self._storages: dict = {}

    def find_class(self, module: str, name: str):
        real = _SAFE_GLOBALS.get((module, name))
        if real is not None:
            return real
        if module == "torch._utils" and name in _REBUILDERS:
            return _REBUILDERS[name]
        if (module == "torch" or module.startswith("torch.storage")) \
                and name in _STORAGE_DTYPES:
            return _StorageType(name)
        if module == "torch" and name == "Size":
            return tuple
        # anything else — ultralytics/torch classes, functions, dtypes —
        # becomes an inert stub recording its identity
        return type(f"stub_{name}", (_Stub,),
                    {"_qualname": f"{module}.{name}"})

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(
                f"unsupported persistent id: {pid!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], \
            pid[4]
        if key in self._storages:
            return self._storages[key]
        if isinstance(storage_type, _StorageType):
            dtype = storage_type.dtype
            tname = storage_type.name
        else:  # a stubbed storage class we don't know
            dtype, tname = None, getattr(storage_type, "_qualname", "?")
        if dtype is None:
            raise pickle.UnpicklingError(
                f"unsupported storage type {tname}")
        st = _Storage(self._zf, f"{self._prefix}data/{key}", dtype,
                      int(numel))
        self._storages[key] = st
        return st


def read_pt(path: str):
    """Unpickle a torch zip-format checkpoint with no torch dependency.
    Returns the (partially stubbed) object graph; tensors are numpy."""
    if not zipfile.is_zipfile(path):
        raise ValueError(
            f"{path} is not a torch zip-format checkpoint (legacy "
            "pre-torch-1.6 serialization is not supported; re-save with "
            "a modern torch or export an .npz state dict)")
    zf = zipfile.ZipFile(path)
    names = zf.namelist()
    pkl = [n for n in names if n == "data.pkl" or n.endswith("/data.pkl")]
    if not pkl:
        raise ValueError(f"{path}: no data.pkl entry — not a torch "
                         "checkpoint archive")
    prefix = pkl[0][: -len("data.pkl")]
    bo = f"{prefix}byteorder"
    if bo in names and zf.read(bo).decode().strip() != "little":
        raise ValueError(f"{path}: big-endian checkpoints unsupported")
    with zf.open(pkl[0]) as f:
        return _RestrictedUnpickler(f, zf, prefix).load()


def _module_state_dict(mod, prefix: str = "") -> "OrderedDict":
    """Walk a stubbed nn.Module graph exactly like
    `nn.Module.state_dict()`: own `_parameters` + `_buffers`, then
    recurse into `_modules` with dotted prefixes."""
    sd: "OrderedDict" = OrderedDict()
    d = getattr(mod, "__dict__", {})
    for name, p in (d.get("_parameters") or {}).items():
        if p is not None:
            sd[prefix + name] = p
    for name, b in (d.get("_buffers") or {}).items():
        if b is not None:
            sd[prefix + name] = b
    for name, m in (d.get("_modules") or {}).items():
        if m is not None:
            sd.update(_module_state_dict(m, prefix + name + "."))
    return sd


def _looks_like_module(obj) -> bool:
    d = getattr(obj, "__dict__", None)
    return isinstance(d, dict) and (
        "_modules" in d or "_parameters" in d or "_buffers" in d)


def read_pt_state_dict(path: str) -> Dict[str, np.ndarray]:
    """`.pt` -> flat {torch_key: float32/int numpy array} state dict.

    Mirrors the engine's load rule (`attempt_load_one_weight`): prefer
    the `ema` entry, then `model`, then treat the payload itself as a
    module or a plain state dict. Float tensors are cast to float32
    (the engine calls `.float()` after loading its half-saved weights).
    """
    obj = read_pt(path)
    cand = obj
    if isinstance(obj, dict):
        cand = obj.get("ema") or obj.get("model") \
            or obj.get("state_dict") or obj
    if _looks_like_module(cand):
        sd = _module_state_dict(cand)
    elif isinstance(cand, dict):
        sd = cand
    else:
        raise ValueError(f"{path}: cannot locate a module or state dict "
                         f"in the checkpoint (got {type(cand)!r})")
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if not isinstance(v, np.ndarray):
            continue  # stubbed non-tensor entries
        if (v.dtype.kind == "f" and v.dtype != np.float32) \
                or v.dtype.name == "bfloat16":
            v = v.astype(np.float32)
        out[str(k)] = v
    if not out:
        raise ValueError(f"{path}: no tensors found in checkpoint")
    return out
