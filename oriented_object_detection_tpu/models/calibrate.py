"""Detection-density calibration for randomly-initialized models.

Random init emits an almost-constant tiny confidence everywhere (the
engine's sparse cls-bias init, `yolo11_obb.py`, plus near-zero logit
variance), so a freshly-initialized model produces ZERO detections at
the 0.25 predict threshold — which made every "random weights"
correctness check vacuous (VERDICT r03 weak #1: sharded-vs-single
inference parity was comparing empty sets). `calibrate_density` shifts
the cls-branch biases so a target fraction of anchors score ~0.45,
comfortably above the threshold even under bf16 rounding (pinning the
tail at exactly 0.25 collapses: every score quantizes to the threshold
and the strict `>` comparison drops all of them — observed as
det_counts [0, 0] in the first r02 bench run).

Used by bench.py's random+density rows, the sharded-inference parity
tests, and `__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

import numpy as np

DENSITY_TARGET = 0.01


def calibrate_density(model, variables, tile_size: int, channels: int,
                      target: float = DENSITY_TARGET):
    """Shift every cls-branch bias so `target` of anchors land at conf
    ~0.45. Returns new variables; the forward must be jitted (an eager
    x-scale forward dispatches hundreds of per-op tunnel RPCs)."""
    import jax
    import jax.numpy as jnp

    from . import decode as D

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randint(0, 255, (8, tile_size, tile_size,
                                         channels)) / 255.0, jnp.float32)

    @jax.jit
    def fwd(v, xx):
        return D.decode_raw(model.apply(v, xx), tile_size)[1]

    scores = fwd(variables, x)
    s = np.asarray(scores, np.float64).reshape(-1)
    s = np.clip(s, 1e-9, 1 - 1e-9)
    logits = np.log(s / (1 - s))
    thr_logit = float(np.log(0.45 / 0.55))
    offset = thr_logit - float(np.quantile(logits, 1.0 - target))

    def shift(path, leaf):
        keys = [getattr(k, "key", "") for k in path]
        if any(str(k).startswith("cv3_") and str(k).endswith("_2")
               for k in keys) and str(keys[-1]) == "bias":
            return leaf + offset
        return leaf

    return jax.tree_util.tree_map_with_path(shift, variables)
