"""Inference-time Conv+BN folding (the engine's `fuse()` step).

Ultralytics fuses Conv2d+BatchNorm before predict; the TPU rebuild kept
them separate through r03, paying a per-channel scale multiply inside
every post-conv elementwise fusion (~100 ConvBN blocks per forward,
VERDICT r03 weak #3). `fold_bn_variables` absorbs the BatchNorm affine
into the conv kernel and neutralizes the BN parameters so the module
graph is unchanged:

    inv      = scale / sqrt(var + eps)
    kernel' .= kernel * inv          (HWIO: out channel is last)
    bias'    = bn_bias - mean * inv
    scale'=1, mean'=0, var'=1-eps    => BN(x) == x + bias'

i.e. after folding the BatchNorm computes exactly `x + bias'` (the
sqrt((1-eps)+eps) == 1), which XLA folds into the conv epilogue like a
plain conv bias. Results match the unfolded network to fp tolerance
(the reassociation (conv(x)*inv - mean*inv) vs conv'(x) + bias' differs
in the last ulps only).

Host-side numpy transform: runs only on checkpoint-loaded numpy trees —
eager per-leaf device math would cost one tunnel RPC per op on this box
(CLAUDE.md), so device-resident trees (fresh inits in tests/bench random
rows) are passed through untouched by the caller's guard.
"""

from __future__ import annotations

import numpy as np

from .layers import BN_EPS


def fold_bn_variables(variables: dict, eps: float = BN_EPS) -> dict:
    """Return new {'params', 'batch_stats'} with every sibling
    conv/bn pair folded (see module docstring). Input trees are not
    modified; all leaves must be host numpy arrays."""
    params = _copy_tree(variables["params"])
    stats = _copy_tree(variables.get("batch_stats", {}))
    _fold(params, stats, eps)
    return {"params": params, "batch_stats": stats}


def _copy_tree(t):
    if isinstance(t, dict) or hasattr(t, "items"):
        return {k: _copy_tree(v) for k, v in t.items()}
    return np.asarray(t)


def _fold(pnode: dict, snode: dict, eps: float):
    if not isinstance(pnode, dict):
        return
    conv = pnode.get("conv")
    bn = pnode.get("bn")
    sbn = snode.get("bn") if isinstance(snode, dict) else None
    if (isinstance(conv, dict) and "kernel" in conv
            and isinstance(bn, dict) and "scale" in bn
            and isinstance(sbn, dict) and "mean" in sbn):
        k = np.asarray(conv["kernel"])
        scale = np.asarray(bn["scale"], np.float64)
        bias = np.asarray(bn["bias"], np.float64)
        mean = np.asarray(sbn["mean"], np.float64)
        var = np.asarray(sbn["var"], np.float64)
        inv = scale / np.sqrt(var + eps)
        conv["kernel"] = (k.astype(np.float64) * inv).astype(k.dtype)
        bn["scale"] = np.ones_like(scale, dtype=np.asarray(
            bn["scale"]).dtype)
        bn["bias"] = (bias - mean * inv).astype(np.asarray(
            bn["bias"]).dtype)
        sbn["mean"] = np.zeros_like(mean, dtype=np.asarray(
            sbn["mean"]).dtype)
        sbn["var"] = np.full_like(var, 1.0 - eps, dtype=np.asarray(
            sbn["var"]).dtype)
    for key, sub in pnode.items():
        if isinstance(sub, dict) and key not in ("conv", "bn"):
            _fold(sub, snode.get(key, {}) if isinstance(snode, dict)
                  else {}, eps)
