"""Torch-free `.pt` ingestion (VERDICT r04 #1).

Three oracle layers:

1. A torch-format zip HAND-BUILT without torch (the serialization format
   is stable: zip with data.pkl + raw storage entries, persistent-id
   tuples `('storage', <type>, key, loc, numel)`) — proves the reader
   needs nothing beyond the documented format.
2. Real `torch.save` output (torch is in the test image): byte-level
   ground truth incl. fp16/bf16, non-contiguous views, shared storages,
   scalar tensors, and the engine's ema-preference rule.
3. A FULL fake ultralytics checkpoint synthesized from
   engine_manifest.json (module tree pickled under fake
   `ultralytics.nn.tasks` class names that our reader must stub), driven
   through `oodt convert` end to end: zero missing / extra / mismatched
   arrays vs a freshly-built model.
"""

import io
import pickle
import sys
import types
import zipfile
from collections import OrderedDict

import numpy as np
import pytest

from oriented_object_detection_tpu.models.pt_reader import (
    read_pt, read_pt_state_dict)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


# ---------------------------------------------------------------- layer 1

class _FakeStoragePlaceholder:
    def __init__(self, key, arr):
        self.key, self.arr = key, arr


def _handbuild_pt(path, tensors: dict):
    """Write a torch zip-format checkpoint using only stdlib + numpy.

    Emulates torch.serialization._save: data.pkl carries
    `_rebuild_tensor_v2(<persistent storage>, offset, size, stride, ...)`
    reduces; storages live as raw little-endian bytes under data/<key>.
    """
    # fake module objects so plain pickle emits GLOBAL torch FloatStorage
    # / GLOBAL torch._utils _rebuild_tensor_v2 without torch importable
    fake_torch = types.ModuleType("torch")
    fake_utils = types.ModuleType("torch._utils")

    class FloatStorage:  # noqa: N801 - must match the torch name
        pass

    FloatStorage.__module__ = "torch"
    FloatStorage.__qualname__ = "FloatStorage"

    def _rebuild_tensor_v2(*a):  # never called at save time
        raise AssertionError

    _rebuild_tensor_v2.__module__ = "torch._utils"
    _rebuild_tensor_v2.__qualname__ = "_rebuild_tensor_v2"
    fake_torch.FloatStorage = FloatStorage
    fake_torch._utils = fake_utils
    fake_utils._rebuild_tensor_v2 = _rebuild_tensor_v2

    saved = {k: sys.modules.get(k) for k in ("torch", "torch._utils")}
    sys.modules["torch"] = fake_torch
    sys.modules["torch._utils"] = fake_utils
    try:
        storages = {}

        class Tensor:
            def __init__(self, key, arr):
                self.key, self.arr = key, arr

            def __reduce__(self):
                arr = self.arr
                strides = tuple(s // arr.itemsize for s in arr.strides)
                return (_rebuild_tensor_v2,
                        (_FakeStoragePlaceholder(self.key, arr), 0,
                         arr.shape, strides, False, OrderedDict()))

        obj = OrderedDict()
        for i, (name, arr) in enumerate(tensors.items()):
            key = str(i)
            storages[key] = np.ascontiguousarray(arr, np.float32)
            obj[name] = Tensor(key, storages[key])

        class P(pickle.Pickler):
            def persistent_id(self, o):
                if isinstance(o, _FakeStoragePlaceholder):
                    return ("storage", FloatStorage, o.key, "cpu",
                            int(o.arr.size))
                return None

        buf = io.BytesIO()
        P(buf, protocol=2).dump(obj)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/version", "3\n")
        zf.writestr("archive/byteorder", "little")
        for key, arr in storages.items():
            zf.writestr(f"archive/data/{key}", arr.tobytes())


class TestHandBuiltFormat:
    def test_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        tensors = {"w": rng.randn(4, 3, 2, 2).astype(np.float32),
                   "b": rng.randn(4).astype(np.float32)}
        p = str(tmp_path / "hand.pt")
        _handbuild_pt(p, tensors)
        sd = read_pt_state_dict(p)
        assert set(sd) == {"w", "b"}
        for k in tensors:
            np.testing.assert_array_equal(sd[k], tensors[k])

    def test_rejects_non_zip(self, tmp_path):
        p = tmp_path / "legacy.pt"
        p.write_bytes(b"\x80\x02not a zip")
        with pytest.raises(ValueError, match="zip-format"):
            read_pt(str(p))


# ---------------------------------------------------------------- layer 2

class _TinyBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = nn.Conv2d(3, 8, 3, bias=False)
        self.bn = nn.BatchNorm2d(8)


class _TinyM(nn.Module):
    def __init__(self):
        super().__init__()
        self.model = nn.Sequential(_TinyBlock(), nn.Conv2d(8, 4, 1))


class TestTorchGroundTruth:
    def test_tensor_zoo(self, tmp_path):
        t = torch.arange(24, dtype=torch.float32).reshape(4, 6)
        base = torch.arange(10, dtype=torch.float32)
        d = {
            "a": t,
            "b": t.t(),                    # non-contiguous, shared storage
            "h": torch.randn(3, 3).half(),
            "bf": torch.randn(2, 5).bfloat16(),
            "i": torch.arange(7, dtype=torch.int64),
            "slice": base[2:9],            # nonzero storage offset
            "scalar": torch.tensor(3.5),
            "bool": torch.tensor([True, False, True]),
        }
        p = str(tmp_path / "zoo.pt")
        torch.save(d, p)
        sd = read_pt_state_dict(p)
        for k, v in d.items():
            ref = v.float().numpy() \
                if v.dtype in (torch.float16, torch.bfloat16) else \
                v.numpy()
            assert sd[k].shape == tuple(v.shape)
            np.testing.assert_array_equal(sd[k], ref)
        # engine load rule: half floats come back as float32
        assert sd["h"].dtype == np.float32
        assert sd["bf"].dtype == np.float32
        assert sd["i"].dtype == np.int64

    def test_module_ckpt_and_ema_preference(self, tmp_path):
        m, ema = _TinyM().half(), _TinyM()
        with torch.no_grad():
            for q in ema.parameters():
                q.mul_(0).add_(7.0)
        p = str(tmp_path / "ck.pt")
        torch.save({"epoch": 3, "model": m, "ema": None,
                    "train_args": {"imgsz": 416}}, p)
        sd = read_pt_state_dict(p)
        ref = {k: v.float().numpy() for k, v in m.state_dict().items()}
        assert set(sd) == set(ref)
        for k in ref:
            np.testing.assert_array_equal(sd[k], ref[k])

        # ema present -> ema wins (attempt_load_one_weight rule)
        torch.save({"model": m, "ema": ema}, p)
        sd = read_pt_state_dict(p)
        np.testing.assert_array_equal(
            sd["model.1.weight"],
            ema.state_dict()["model.1.weight"].numpy())


# ---------------------------------------------------------------- layer 3

def _module_tree_from_manifest(manifest: dict) -> nn.Module:
    """Build an nn.Module whose state_dict() keys equal the manifest's."""
    rng = np.random.RandomState(7)
    root = nn.Module()
    for key, shape in manifest.items():
        parts = key.split(".")
        node = root
        for pname in parts[:-1]:
            child = node._modules.get(pname)
            if child is None:
                child = nn.Module()
                node.add_module(pname, child)
            node = child
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            node.register_buffer(leaf, torch.tensor(0, dtype=torch.long))
        elif leaf in ("running_mean", "running_var"):
            node.register_buffer(
                leaf, torch.from_numpy(
                    rng.randn(*shape).astype(np.float32)))
        else:
            node.register_parameter(
                leaf, nn.Parameter(torch.from_numpy(
                    rng.randn(*shape).astype(np.float32) * 0.05)))
    return root


def _fake_ultralytics_ckpt(tmp_path, manifest, monkeypatch):
    """torch.save a ckpt whose root object carries an ultralytics class
    name (fake module injected only for pickling) — the reader must stub
    it without ultralytics installed."""
    tree = _module_tree_from_manifest(manifest)

    fake_pkg = types.ModuleType("ultralytics")
    fake_nn = types.ModuleType("ultralytics.nn")
    fake_tasks = types.ModuleType("ultralytics.nn.tasks")

    class OBBModel(nn.Module):
        pass

    OBBModel.__module__ = "ultralytics.nn.tasks"
    OBBModel.__qualname__ = "OBBModel"
    fake_tasks.OBBModel = OBBModel
    fake_pkg.nn = fake_nn
    fake_nn.tasks = fake_tasks
    monkeypatch.setitem(sys.modules, "ultralytics", fake_pkg)
    monkeypatch.setitem(sys.modules, "ultralytics.nn", fake_nn)
    monkeypatch.setitem(sys.modules, "ultralytics.nn.tasks", fake_tasks)

    wrapper = OBBModel()
    wrapper.model = tree.model  # type: ignore[attr-defined]
    p = str(tmp_path / "best_fake.pt")
    torch.save({"epoch": 99, "model": wrapper, "ema": None,
                "train_args": {"imgsz": 416, "task": "obb"}}, p)
    return p, tree


class TestManifestEndToEnd:
    @pytest.fixture(scope="class")
    def manifest(self):
        import json
        import os

        import oriented_object_detection_tpu.models as M
        path = os.path.join(os.path.dirname(M.__file__),
                            "engine_manifest.json")
        return json.load(open(path))["yolo11n-obb-3ch"]

    def test_reader_reproduces_manifest_keyspace(self, tmp_path,
                                                 manifest, monkeypatch):
        p, tree = _fake_ultralytics_ckpt(tmp_path, manifest, monkeypatch)
        # remove the fake ultralytics BEFORE reading: the reader must
        # cope via stubs
        for k in ("ultralytics", "ultralytics.nn",
                  "ultralytics.nn.tasks"):
            monkeypatch.delitem(sys.modules, k, raising=False)
        sd = read_pt_state_dict(p)
        assert set(sd) == set(manifest)
        for k, shape in manifest.items():
            assert sd[k].shape == tuple(shape), k
            np.testing.assert_array_equal(
                sd[k], tree.state_dict()[k].numpy())

    def test_oodt_convert_end_to_end(self, tmp_path, manifest,
                                     monkeypatch):
        """`oodt convert fake.pt` -> ckpt with zero missing/extra/
        mismatched arrays vs a freshly-built model (VERDICT r04 #1)."""
        import jax
        import jax.numpy as jnp

        from oriented_object_detection_tpu.cli import main
        from oriented_object_detection_tpu.models import YOLO11OBB
        from oriented_object_detection_tpu.models.weights import (
            validate_against)
        from oriented_object_detection_tpu.train.trainer import (
            load_checkpoint)

        p, tree = _fake_ultralytics_ckpt(tmp_path, manifest, monkeypatch)
        for k in ("ultralytics", "ultralytics.nn",
                  "ultralytics.nn.tasks"):
            monkeypatch.delitem(sys.modules, k, raising=False)
        out = str(tmp_path / "conv.ckpt")
        main(["convert", p, "--out", out, "--scale", "n",
              "--channels", "3", "--nc", "12", "--imgsz", "64"])

        ck = load_checkpoint(out)
        m = YOLO11OBB(nc=12, scale="n", in_channels=3)
        ref = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        rep = validate_against(
            {"params": ck["params"], "batch_stats": ck["batch_stats"]},
            ref)
        assert rep["missing"] == []
        assert rep["extra"] == []
        assert rep["mismatched"] == []

        # numeric spot check: stem kernel is the OIHW->HWIO transpose
        w = tree.state_dict()["model.0.conv.weight"].numpy()
        np.testing.assert_array_equal(
            np.asarray(ck["params"]["l0"]["conv"]["kernel"]),
            w.transpose(2, 3, 1, 0))
