"""Ultralytics .pt (torch) -> flax parameter conversion.

The reference initializes from `yolo11x-obb.pt` and serves fine-tuned
`best{128,416}.pt` checkpoints (`Train_OBB.py:792`, `Detect_OBB.py:26`);
those weights live on Google Drive (README:183-188) and are not bundled, so
this module provides the mapping layer needed for parity runs: a
state-dict-level converter from the ultralytics YOLO11-OBB module tree to
this package's flax module tree (`l0..l23`, see `yolo11_obb.py`).

Usage paths:
  * `convert_state_dict(sd, ...)` — sd is a {name: np.ndarray} state
    dict. Full ultralytics `.pt` files are ingested torch-free by
    `pt_reader.read_pt_state_dict` (restricted unpickler over the torch
    zip format; ultralytics/torch classes become inert stubs), so
    `oodt convert best416.pt` works with neither torch nor ultralytics
    installed.
  * `export_state_dict(variables, ...)` — the inverse, for round-trip
    validation and for exporting our checkpoints to torch consumers.

Channel-order note: ultralytics' predictor/trainer flip BGR->RGB, so for
3ch models the stems line up directly. For 4ch models the reference's
channel flip turns [R,G,B,DT] into [DT,B,G,R] at the network boundary;
ours feeds [R,G,B,DT], so stem input channels are REVERSED on conversion
(`reverse_stem_channels`).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _set(tree: dict, path: list[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _torch_key_to_flax(key: str) -> tuple[list[str], str] | None:
    """Translate one ultralytics state-dict key to (flax path, kind).

    kind: 'kernel' (conv weight), 'bias' (conv bias), 'scale', 'bn_bias',
    'mean', 'var', or None to skip. Returns None for skippable keys.
    """
    if key.endswith("num_batches_tracked"):
        return None
    # strip the graph prefix
    key = re.sub(r"^model\.", "", key)
    m = re.match(r"^(\d+)\.(.*)$", key)
    if not m:
        return None
    layer = int(m.group(1))
    rest = m.group(2)
    if layer in (11, 14):  # Upsample: no params
        return None
    path = [f"l{layer}"]

    if layer == 23:
        # head: cv2/cv3/cv4 . level . stage . ...
        hm = re.match(r"^cv([234])\.(\d+)\.(\d+)\.(.*)$", rest)
        if hm is None:
            return None  # e.g. dfl.conv.weight (fixed bins, not needed)
        branch, lvl, stage = int(hm.group(1)), int(hm.group(2)), \
            int(hm.group(3))
        tail = hm.group(4)
        if tail in ("weight", "bias"):
            # final plain Conv2d: flax params live directly on the module
            path.append(f"cv{branch}_{lvl}_{stage}")
            return path, ("kernel" if tail == "weight" else "bias")
        if branch == 3:
            # cv3.{lvl}.{a}.{b}.<convbn tail>: Sequential of
            # (DWConv, Conv) pairs
            sm = re.match(r"^(\d+)\.(.*)$", tail)
            sub, tail = int(sm.group(1)), sm.group(2)
            path.append(f"cv3_{lvl}_{stage}_{sub}")
            if sub == 0:  # DWConv wraps ConvBN under 'dw'
                path.append("dw")
        else:
            path.append(f"cv{branch}_{lvl}_{stage}")
        rest = tail
    else:
        # generic module tree: cvN / m.J / attn / ffn.K / qkv / proj / pe
        parts = rest.split(".")
        rest = None
        out = []
        i = 0
        while i < len(parts):
            p = parts[i]
            if p == "m" and i + 1 < len(parts) and parts[i + 1].isdigit():
                out.append(f"m_{parts[i + 1]}")
                i += 2
            elif p == "ffn" and i + 1 < len(parts) and \
                    parts[i + 1].isdigit():
                out.append(f"ffn_{parts[i + 1]}")
                i += 2
            elif p in ("conv", "bn", "weight", "bias", "running_mean",
                       "running_var"):
                rest = ".".join(parts[i:])
                break
            else:
                out.append(p)
                i += 1
        path.extend(out)

    if rest is None:
        return None
    if rest == "conv.weight":
        return path + ["conv"], "kernel"
    if rest == "conv.bias":
        return path + ["conv"], "bias"
    if rest == "bn.weight":
        return path + ["bn"], "scale"
    if rest == "bn.bias":
        return path + ["bn"], "bn_bias"
    if rest == "bn.running_mean":
        return path + ["bn"], "mean"
    if rest == "bn.running_var":
        return path + ["bn"], "var"
    return None


def convert_state_dict(sd: Dict[str, np.ndarray],
                       reverse_stem_channels: bool = False) -> dict:
    """Ultralytics state dict -> {'params': ..., 'batch_stats': ...}.

    Conv weights transpose OIHW -> HWIO (works for depthwise too:
    [C,1,kh,kw] -> [kh,kw,1,C])."""
    params: dict = {}
    stats: dict = {}
    for key, val in sd.items():
        trans = _torch_key_to_flax(key)
        if trans is None:
            continue
        path, kind = trans
        v = np.asarray(val)
        if kind == "kernel":
            v = v.transpose(2, 3, 1, 0)
            if reverse_stem_channels and path[0] == "l0" \
                    and "conv" in path:
                v = v[:, :, ::-1, :]
            _set(params, path + ["kernel"], v)
        elif kind == "bias":
            _set(params, path + ["bias"], v)
        elif kind == "scale":
            _set(params, path + ["scale"], v)
        elif kind == "bn_bias":
            _set(params, path + ["bias"], v)
        elif kind == "mean":
            _set(stats, path + ["mean"], v)
        elif kind == "var":
            _set(stats, path + ["var"], v)
    return {"params": params, "batch_stats": stats}


def _flatten(tree: dict, prefix=()) -> dict:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def validate_against(variables_converted: dict, variables_model: dict):
    """Assert the converted tree covers the model tree with matching
    shapes. Returns (n_params_matched, missing, extra)."""
    conv = _flatten(variables_converted["params"])
    conv.update(_flatten(variables_converted["batch_stats"]))
    ref = _flatten(dict(variables_model["params"]))
    ref.update(_flatten(dict(variables_model.get("batch_stats", {}))))
    missing = [k for k in ref if k not in conv]
    extra = [k for k in conv if k not in ref]
    mismatched = [
        (k, conv[k].shape, np.asarray(ref[k]).shape) for k in ref
        if k in conv and tuple(conv[k].shape) != tuple(
            np.asarray(ref[k]).shape)]
    return {"matched": len(ref) - len(missing), "missing": missing,
            "extra": extra, "mismatched": mismatched}


def export_state_dict(variables: dict,
                      reverse_stem_channels: bool = False
                      ) -> Dict[str, np.ndarray]:
    """Inverse conversion: flax variables -> ultralytics-style state dict
    (for round-trip tests / torch consumers)."""
    out: Dict[str, np.ndarray] = {}

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + [k])
            else:
                out_key = _flax_path_to_torch(path + [k])
                if out_key is None:
                    continue
                val = np.asarray(v)
                if k == "kernel":  # conv weight: HWIO -> OIHW
                    if reverse_stem_channels and path and \
                            path[0] == "l0":
                        val = val[:, :, ::-1, :]
                    val = val.transpose(3, 2, 0, 1)
                out[out_key] = val

    walk(dict(variables["params"]), [])
    walk(dict(variables.get("batch_stats", {})), [])
    return out


def _flax_path_to_torch(path: list[str]) -> str | None:
    parts = []
    leaf = path[-1]
    for p in path[:-1]:
        m = re.match(r"^l(\d+)$", p)
        if m:
            parts.append(f"model.{m.group(1)}")
            continue
        hm = re.match(r"^cv([234])_(\d+)_(\d+)(?:_(\d+))?$", p)
        if hm and parts and parts[0].endswith(".23"):
            b, lvl, st, sub = hm.groups()
            seg = f"cv{b}.{lvl}.{st}" + (f".{sub}" if sub else "")
            parts.append(seg)
            continue
        mm = re.match(r"^(m|ffn)_(\d+)$", p)
        if mm:
            parts.append(f"{mm.group(1)}.{mm.group(2)}")
            continue
        if p == "dw":
            continue  # DWConv wrapper is transparent in torch naming
        parts.append(p)
    name = ".".join(parts)
    plain_head_conv = re.search(r"cv[234]\.\d+\.\d+$", name) is not None
    if leaf == "kernel":
        if name.endswith("conv") or plain_head_conv:
            return name + ".weight"
        return name + ".conv.weight"
    if leaf == "bias" and (name.endswith("conv") or plain_head_conv):
        return name + ".bias"
    if leaf == "scale":
        return name + ".weight"
    if leaf == "bias":
        return name + ".bias"
    if leaf == "mean":
        return name + ".running_mean"
    if leaf == "var":
        return name + ".running_var"
    return None
