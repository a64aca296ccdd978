"""Training driver: optimizer/schedule/EMA/train-step with pjit DP.

Rebuilds the trainer loop the reference delegates to ultralytics
(`Train_OBB.py:796-841`): SGD(nesterov, momentum 0.937) with decoupled
weight decay on conv/linear kernels only, linear lr decay lr0 -> lr0*lrf
over the epoch budget with a warmup ramp, EMA (decay 0.9999 with
1-exp(-step/tau) ramp), early-stop patience, best/last checkpoints — as a
jitted functional train step whose batch is sharded over the `data` mesh
axis (gradient psum inserted by XLA; the TPU equivalent of the reference's
torch DDP path).
"""

from __future__ import annotations

import collections
import functools
import os
import pickle
import sys
import threading
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from flax.core import FrozenDict

from ..config import TrainConfig
from ..models import YOLO11OBB
from ..parallel import mesh as PM
from .loss import LossConfig, obb_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any        # SGD momentum buffers (pytree like params)
    ema_params: Any
    # runtime schedule parameters [total_steps, warm_steps, lr0, lrf,
    # warmup_momentum, momentum, warmup_bias_lr] — carried in the state
    # (NOT baked into the program) so changing epochs/steps/lr never
    # recompiles the train step; remote compiles cost up to ~30 min here
    sched: jnp.ndarray


def make_sched_vector(cfg: TrainConfig, steps_per_epoch: int) -> jnp.ndarray:
    total = float(cfg.epochs * steps_per_epoch)
    warm = float(max(1, int(cfg.warmup_epochs * steps_per_epoch)))
    return jnp.asarray([total, warm, cfg.lr0, cfg.lrf,
                        cfg.warmup_momentum, cfg.momentum,
                        cfg.warmup_bias_lr], jnp.float32)


def schedule_hypers(sched, step):
    """Engine warmup/decay hyperparameters at `step` (traced or host):
    lr decays linearly lr0 -> lr0*lrf over total_steps; over the warmup
    window momentum ramps warmup_momentum->momentum (0.8 -> 0.937) and
    the bias group's lr ramps warmup_bias_lr->scheduled (0.1 -> lr0)
    while other groups ramp 0->scheduled (`Train_OBB.py:796-841` via the
    ultralytics trainer defaults)."""
    total, warm, lr0, lrf, wmom, mom, wbias = (sched[i] for i in range(7))
    s = jnp.asarray(step, jnp.float32)
    frac = jnp.minimum(s, total - 1.0) / total
    base = lr0 * (1.0 - frac) + (lr0 * lrf) * frac
    w = jnp.clip(s / warm, 0.0, 1.0)
    return {
        "lr": base * w,
        "lr_bias": wbias * (1.0 - w) + base * w,
        "momentum": wmom * (1.0 - w) + mom * w,
    }


def decay_mask(params) -> Any:
    """Weight decay on >=2D kernels only (conv/linear weights); biases,
    BN scales/offsets excluded — the engine's param-group split."""
    return jax.tree.map(lambda p: p.ndim >= 2, params)


def bias_labels(params) -> Any:
    """Label every `bias` leaf (conv biases, BN offsets) "bias" and the
    rest "main" — the engine's g2 param group, which warms up from
    warmup_bias_lr instead of 0."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree.structure(params)
    labels = []
    for path, _ in flat:
        key = path[-1]
        name = getattr(key, "key", getattr(key, "name", str(key)))
        labels.append("bias" if str(name) == "bias" else "main")
    return jax.tree.unflatten(treedef, labels)


def sgd_apply(params, grads, mu, hypers, weight_decay: float,
              mask, labels):
    """torch-SGD(nesterov, coupled weight decay) with per-group lr, all
    hyperparameters traced scalars (identical math to the optax chain
    add_decayed_weights -> trace(nesterov) -> per-group scale, but with
    nothing baked into the program). Returns (new_params, new_mu)."""
    mom = hypers["momentum"]
    lr_main, lr_bias = hypers["lr"], hypers["lr_bias"]

    def one(p, g, m, decayed, label):
        g = g + weight_decay * p if decayed else g
        m_new = g + mom * m
        u = g + mom * m_new            # nesterov
        lr = lr_bias if label == "bias" else lr_main
        return p - lr * u, m_new

    out = jax.tree.map(one, params, grads, mu, mask, labels)
    new_params = jax.tree.map(lambda t: t[0], out,
                              is_leaf=lambda t: isinstance(t, tuple))
    new_mu = jax.tree.map(lambda t: t[1], out,
                          is_leaf=lambda t: isinstance(t, tuple))
    return new_params, new_mu


def create_train_state(cfg: TrainConfig, rng: jax.Array,
                       steps_per_epoch: int = 100,
                       model: Optional[YOLO11OBB] = None):
    """Returns (model, state, None). (Third slot kept for caller
    compatibility; the optimizer is the hand-rolled SGD inside the train
    step — its momentum buffers live in state.opt_state and its schedule
    in state.sched, so no optax transform object exists anymore.)"""
    model = model or YOLO11OBB(nc=cfg.nc, scale=cfg.model_scale,
                               in_channels=cfg.channels)
    x = jnp.zeros((1, cfg.tile_size, cfg.tile_size, cfg.channels),
                  jnp.float32)
    variables = model.init(rng, x, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=jax.tree.map(jnp.zeros_like, params),
        # real copy: ema aliasing params would donate buffers twice in
        # the donated train step
        ema_params=jax.tree.map(jnp.array, params),
        sched=make_sched_vector(cfg, steps_per_epoch),
    )
    return model, state, None


def ema_update(ema, new, step, decay: float, tau: float):
    """EMA with ramped decay d = decay * (1 - exp(-step / tau))."""
    d = decay * (1.0 - jnp.exp(-step.astype(jnp.float32) / tau))
    return jax.tree.map(lambda e, p: e * d + p * (1.0 - d), ema, new)


METRIC_KEYS = ("loss", "box", "cls", "dfl", "fg_count")


def metrics_dict(metrics_vec) -> dict:
    """ONE host fetch of a packed train-step metrics vector -> python
    floats keyed by METRIC_KEYS. Through this box's TPU tunnel every
    device->host fetch costs ~35-70 ms of RPC latency regardless of
    size, so the train step returns its five scalars packed in a single
    [5] array instead of a dict of scalars (5 fetches = ~250 ms/step,
    4-20x the step's own compute)."""
    v = np.asarray(metrics_vec, np.float32)
    return dict(zip(METRIC_KEYS, (float(x) for x in v)))


def make_train_step(model: YOLO11OBB, tx, cfg: TrainConfig,
                    loss_cfg: LossConfig):
    """Returns jitted train_step(state, batch) -> (state, metrics_vec)
    with metrics_vec a packed float32 [5] array ordered like METRIC_KEYS
    (see `metrics_dict` for why it is not a dict of scalars).

    batch: images [B,ts,ts,C] float 0..1, gt_labels [B,M], gt_xywhr
    [B,M,5] px, gt_mask [B,M]. Under a mesh, shard the batch leading axis
    over `data`; XLA inserts the gradient all-reduce.

    `tx` is ignored (kept for caller compatibility): the optimizer is
    SGD(nesterov, coupled wd, per-group warmup lr) computed in-graph from
    state.sched + state.step, so ONE compiled program serves every
    epochs/steps/lr configuration — schedule constants baked into the
    graph cost a fresh ~30-min remote compile per config here.
    """
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def loss_fn(params, batch_stats, batch):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"].astype(dtype), train=True,
            mutable=["batch_stats"])
        total, parts = obb_loss(out, batch["gt_labels"],
                                batch["gt_xywhr"], batch["gt_mask"],
                                loss_cfg)
        return total, (parts, mutated["batch_stats"])

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch):
        (total, (parts, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        hypers = schedule_hypers(state.sched, state.step)
        new_params, new_mu = sgd_apply(
            state.params, grads, state.opt_state, hypers,
            cfg.weight_decay, decay_mask(state.params),
            bias_labels(state.params))
        new_ema = ema_update(state.ema_params, new_params, state.step + 1,
                             cfg.ema_decay, cfg.ema_tau)
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_mu, ema_params=new_ema)
        metrics = jnp.stack([total.astype(jnp.float32)]
                            + [parts[k].astype(jnp.float32)
                               for k in METRIC_KEYS[1:]])
        return new_state, metrics

    return train_step


def make_train_step_multi(step_fn, n_steps: int):
    """K optimizer steps in ONE device program: lax.scan of `step_fn`
    (from make_train_step) over a batch group whose leaves carry a
    leading [n_steps] axis. Measured perf-NEUTRAL on this box
    (59.6 ms/step either way at K=8, x-416-b16: per-program dispatch
    overhead is negligible; an earlier probe's 50 ms/step was XLA
    CSE-ing batch-fixed work across steps fed the SAME traced batch —
    tools/profile/train_multistep.py). Kept as an opt-in for
    environments with real per-dispatch cost. Semantics are the
    step_fn's own, iterated — the schedule advances per inner step via
    state.step as usual. Returns (new_state, metrics [n_steps, K])."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state, batches):
        def body(s, b):
            return step_fn(s, b)
        # unrolled: n_steps is small + static, and the rolled loop
        # form cannot schedule across iteration boundaries
        return jax.lax.scan(body, state, batches, length=n_steps,
                            unroll=True)

    return multi_step


def stack_batches(batches: list) -> dict:
    """Stack a list of batch dicts into one group with leading [K]."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


# ---------------------------------------------------------------------------
# Checkpointing (params + EMA + opt state + step)
# ---------------------------------------------------------------------------
#
# The saved tree (params + batch_stats + EMA + SGD momentum) is ~2100
# small leaves; fetching it leaf-by-leaf (`jax.tree.map(np.asarray, ...)`)
# costs a ~25 ms D2H RPC per leaf through this box's TPU tunnel —
# measured ~19 s per 235 MB tree, ~60-120 s per epoch for the flagship
# x-scale (checkpoint fetch, not compute, dominated CLI training wall).
# Instead a single jitted program concatenates every float32 leaf into
# ONE flat buffer fetched with ONE bulk D2H (~18-25 MB/s measured), and
# `fit` fetches once per epoch in a background thread (best.ckpt and
# last.ckpt are written from the same snapshot) overlapped with the next
# epoch's compute — the orbax-style async pattern. Round-trip is
# bit-exact (tests/test_train.py::test_packed_payload_bitexact).

# one compiled pack program per distinct state structure; LRU-bounded
# like every other long-lived cache (a sweep across many model configs
# would otherwise retain a compiled program per config forever)
_PACK_FN_CACHE: collections.OrderedDict = collections.OrderedDict()
_PACK_FN_CACHE_MAX = 8


def _saved_tree(state: TrainState) -> dict:
    return {"params": state.params, "batch_stats": state.batch_stats,
            "ema_params": state.ema_params, "opt_state": state.opt_state}


def device_state_snapshot(state: TrainState):
    """Device-side stage of a checkpoint save: pack every float32 leaf
    into one freshly-allocated flat buffer (single program dispatch).

    The returned snapshot references only new buffers, so it stays valid
    — and may be fetched from a background thread — while subsequent
    train steps donate and overwrite the live state's buffers."""
    leaves, treedef = jax.tree.flatten(_saved_tree(state))
    spec = tuple((tuple(a.shape), str(np.dtype(a.dtype))) for a in leaves)
    f32 = tuple(i for i, a in enumerate(leaves)
                if np.dtype(a.dtype) == np.float32)
    key = (treedef, spec)
    fn = _PACK_FN_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda ls: jnp.concatenate([l.ravel() for l in ls])
                     if ls else jnp.zeros((0,), jnp.float32))
        _PACK_FN_CACHE[key] = fn
        while len(_PACK_FN_CACHE) > _PACK_FN_CACHE_MAX:
            _PACK_FN_CACHE.popitem(last=False)
    else:
        _PACK_FN_CACHE.move_to_end(key)
    packed = fn([leaves[i] for i in f32])
    # non-f32 leaves (none today — step is fetched below) + step: tiny,
    # fetched eagerly so the background stage needs no live-state access
    f32set = set(f32)
    others = {i: np.asarray(leaves[i])
              for i in range(len(leaves)) if i not in f32set}
    return {"packed": packed, "others": others, "step": int(state.step),
            "treedef": treedef, "spec": spec, "f32": f32}


def payload_from_snapshot(snap: dict) -> dict:
    """Host stage: ONE bulk D2H of the packed buffer -> checkpoint
    payload dict (sans `extra`), bit-identical to per-leaf np.asarray."""
    flat = np.asarray(snap["packed"])
    leaves: list = [None] * len(snap["spec"])
    off = 0
    for i in snap["f32"]:
        shape, _ = snap["spec"][i]
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        leaves[i] = flat[off:off + n].reshape(shape)
        off += n
    for i, a in snap["others"].items():
        leaves[i] = a
    tree = jax.tree.unflatten(snap["treedef"], leaves)
    return {"step": snap["step"], **tree}


def save_checkpoint(path: str, state: TrainState, extra: dict | None = None):
    # SGD momentum buffers ride along: the engine's resume restores
    # optimizer state, so --resume must not restart momentum
    # (VERDICT r02 #4)
    payload = payload_from_snapshot(device_state_snapshot(state))
    _write_checkpoint(path, payload, extra)


def _write_checkpoint(path: str, payload: dict, extra: dict | None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({**payload, "extra": extra or {}}, f)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        ck = pickle.load(f)
    # Distilled committed assets (tools/distill_bench_ckpt.py) store
    # params in float16 to stay small. Upcast HERE so every consumer —
    # `oodt detect --ckpt416 assets/...`, bench, tests — gets fp32
    # params (fp16 x bf16 promotes per-op to f32, off the compute-dtype
    # contract and slower on TPU). ADVICE r03 #1.
    if ck.get("extra", {}).get("distilled_fp16"):
        up = lambda a: a.astype(np.float32) \
            if getattr(a, "dtype", None) == np.float16 else a
        ck["params"] = jax.tree.map(up, ck["params"])
        if ck.get("ema_params") is not None:
            ck["ema_params"] = jax.tree.map(up, ck["ema_params"])
    elif ck.get("extra", {}).get("distilled_int8"):
        # per-output-channel int8 assets (the x-scale flagship ckpts —
        # fp16 would cost ~118 MB per committed file): dequantize large
        # kernels with their stored scale vectors, upcast the fp16 rest,
        # so every consumer still sees an ordinary fp32 tree
        from jax.tree_util import (keystr, tree_flatten_with_path,
                                   tree_unflatten)

        scales = ck.pop("q_scales")
        flat, treedef = tree_flatten_with_path(ck["params"])
        leaves = []
        for path, a in flat:
            s = scales.get(keystr(path))
            if s is not None:
                leaves.append(np.asarray(a, np.float32) * s)
            elif getattr(a, "dtype", None) == np.float16:
                leaves.append(a.astype(np.float32))
            else:
                leaves.append(a)
        ck["params"] = tree_unflatten(treedef, leaves)
    return ck


def variables_from_checkpoint(path: str, use_ema: bool = True) -> dict:
    """Inference variables dict {'params', 'batch_stats'} from a saved
    checkpoint (EMA weights by default, like the engine's best.pt)."""
    ck = load_checkpoint(path)
    params = ck["ema_params"] if use_ema and ck.get("ema_params") is not None \
        else ck["params"]
    return {"params": params, "batch_stats": ck["batch_stats"]}


# ---------------------------------------------------------------------------
# Epoch loop with patience / best tracking
# ---------------------------------------------------------------------------

def restore_train_state(path: str, state: TrainState) -> TrainState:
    """Resume: load params/EMA/batch_stats/opt_state/step from a
    checkpoint into a freshly-created state. SGD momentum is restored
    (engine parity); checkpoints from before r03 lack "opt_state" and
    restart it from zeros with a warning. The lr schedule picks up from
    the restored step."""
    ck = load_checkpoint(path)
    opt = ck.get("opt_state")
    if opt is None:
        print("[Resume] checkpoint has no optimizer state (pre-r03); "
              "momentum restarts from zero")
        opt = state.opt_state
    else:
        opt = jax.tree.map(jnp.asarray, opt)
    return state.replace(
        step=jnp.asarray(ck["step"], jnp.int32),
        params=jax.tree.map(jnp.asarray, ck["params"]),
        batch_stats=jax.tree.map(jnp.asarray, ck["batch_stats"]),
        ema_params=jax.tree.map(jnp.asarray, ck["ema_params"]),
        opt_state=opt,
    )


def warm_start_state(path: str, state: TrainState,
                     expect: dict | None = None) -> TrainState:
    """Warm start (`oodt train --init-ckpt`): load params/batch_stats
    from a (typically converted, `oodt convert`) checkpoint into a fresh
    state WITHOUT touching step/schedule/optimizer — the engine's
    YOLO("yolo11x-obb.pt") pretrained start (`Train_OBB.py:792`), as
    opposed to --resume which continues an interrupted run. The EMA
    weights are preferred when the checkpoint has them (a best.ckpt's
    "best" model IS its EMA, matching the engine's best.pt and our own
    inference default); EMA then re-seeds from the loaded params like
    the engine does at train start."""
    ck = load_checkpoint(path)
    # Fail FAST on architecture mismatch: a wrong-scale/-channels init
    # ckpt would otherwise die minutes later inside the first jitted
    # train step with an opaque tree/shape error. Only keys recorded in
    # the ckpt AND requested by the caller are compared (tile_size is
    # deliberately not: params are size-agnostic, cross-size warm starts
    # are legitimate backbone transfer).
    if expect:
        extra = ck.get("extra") or {}
        for k, want in expect.items():
            have = extra.get(k)
            if have is not None and have != want:
                raise SystemExit(
                    f"--init-ckpt {path}: checkpoint was saved with "
                    f"{k}={have!r} but this run uses {k}={want!r}; "
                    f"convert/choose a matching checkpoint")
    src = ck["ema_params"] if ck.get("ema_params") is not None \
        else ck["params"]
    params = jax.tree.map(jnp.asarray, src)
    return state.replace(
        params=params,
        batch_stats=jax.tree.map(jnp.asarray, ck["batch_stats"]),
        ema_params=jax.tree.map(jnp.array, params),
    )


class _AsyncSaver(threading.Thread):
    """Background checkpoint writer: one bulk D2H of a device snapshot +
    pickle/write, overlapped with the next epoch's training (the snapshot
    references freshly-packed buffers, untouched by the donated train
    step). `jobs` is [(path, extra), ...] — best.ckpt and last.ckpt are
    written from the SAME fetch."""

    def __init__(self, snap: dict, jobs: list):
        super().__init__(daemon=True)
        self.snap, self.jobs, self.exc = snap, jobs, None

    def run(self):
        try:
            payload = payload_from_snapshot(self.snap)
            for path, extra in self.jobs:
                _write_checkpoint(path, payload, extra)
        except BaseException as e:    # re-raised at join in fit()
            self.exc = e


def fit(model, state: TrainState, tx, cfg: TrainConfig, train_batches,
        val_fn=None, ckpt_dir: str = "runs/obb/train", mesh=None,
        log_every: int = 10, resume: bool = False,
        init_ckpt: str | None = None):
    """Simple epoch loop: `train_batches` yields (epoch iterable of batch
    dicts); `val_fn(state) -> float` returns a fitness score (higher
    better). Early-stops after `cfg.patience` epochs without improvement;
    writes best.ckpt / last.ckpt. `resume=True` restores last.ckpt from
    ckpt_dir if present; `init_ckpt` warm-starts params/EMA from a
    converted checkpoint (ignored when resuming).

    Multi-process (jax.distributed) semantics mirror the reference's DDP
    trainer (Train_OBB.py:39-42): every process runs the SAME loop SPMD
    over the global mesh — `train_batches` yields each process's LOCAL
    rows (global_batch / num_hosts), assembled into one global sharded
    array per step — while checkpoints, results.csv/plots, and log lines
    are written by process 0 only. Control flow (best/early-stop) stays
    consistent across processes because metrics are fully replicated."""
    step_fn = make_train_step(model, tx, cfg, LossConfig(
        nc=cfg.nc, img_size=cfg.tile_size, box_gain=cfg.box_gain,
        cls_gain=cfg.cls_gain, dfl_gain=cfg.dfl_gain))
    main = jax.process_index() == 0

    start_epoch = 0
    best, best_epoch = -float("inf"), -1
    last_path = os.path.join(ckpt_dir, "last.ckpt")
    if resume and os.path.exists(last_path):
        ck = load_checkpoint(last_path)
        state = restore_train_state(last_path, state)
        start_epoch = int(ck["extra"].get("epoch", -1)) + 1
        best = float(ck["extra"].get("best_fitness", best))
        best_epoch = int(ck["extra"].get("best_epoch", best_epoch))
        if main:
            print(f"[Resume] from {last_path} @ epoch {start_epoch}")
    elif init_ckpt:
        if not os.path.exists(init_ckpt):
            raise FileNotFoundError(f"--init-ckpt {init_ckpt} not found")
        state = warm_start_state(init_ckpt, state, expect={
            "model_scale": cfg.model_scale, "channels": cfg.channels})
        if main:
            print(f"[WarmStart] params/EMA initialized from {init_ckpt}")

    if jax.process_count() > 1:
        if mesh is None:
            raise ValueError(
                "fit() in a multi-process runtime requires a global mesh "
                "— without one each process would train independently")
        # every process holds the same (host or local-device) state copy;
        # turn it into ONE global array replicated over the multi-host
        # mesh — committed local device buffers can't feed a global-mesh
        # program, so snapshot to host first
        state = PM.replicate(jax.tree.map(np.asarray, state), mesh)

    from ..utils.plots import ResultsWriter, write_args_yaml

    results = None
    if main:
        results = ResultsWriter(ckpt_dir, plots=getattr(cfg, "plots", True))
        write_args_yaml(ckpt_dir, cfg)   # engine run-dir artifact parity
    # metric accumulation stays ON DEVICE for the whole epoch: one host
    # fetch per epoch (+ one per log_every print) instead of per step —
    # per-step fetches cost ~35-70 ms of tunnel RPC each AND break the
    # dispatch pipeline (the next step can't enqueue until the fetch
    # returns), multiplying wall time 3-5x at real step sizes
    acc_fn = jax.jit(lambda a, m: a + m)
    # multi-step dispatch: K optimizer steps per device program (saves
    # ~10 ms tunnel turnaround per step on this box); single-step under
    # a mesh (shard_batch shards the leading axis, which a stacked group
    # repurposes as the step axis)
    spd = max(1, int(getattr(cfg, "steps_per_dispatch", 1)))
    if mesh is not None and spd > 1:
        if main:
            print("[fit] steps_per_dispatch ignored under a device mesh")
        spd = 1
    multi_fn = make_train_step_multi(step_fn, spd) if spd > 1 else None
    acc_multi = jax.jit(lambda a, m: a + m.sum(0)) if spd > 1 else None
    pending: list = []          # at most one in-flight _AsyncSaver

    def _join_pending():
        if pending:
            t = pending.pop()
            t.join()
            if t.exc is not None:
                raise t.exc

    try:
        state = _fit_epochs(
            model, state, cfg, train_batches, val_fn, ckpt_dir, mesh,
            step_fn, acc_fn, spd, multi_fn, acc_multi, results, log_every,
            start_epoch, best, best_epoch, last_path, pending,
            _join_pending)
    finally:
        # flush the in-flight save before returning (or unwinding); keep
        # an original exception over a saver failure
        if pending:
            t = pending.pop()
            t.join()
            if t.exc is not None and sys.exc_info()[0] is None:
                raise t.exc
    return state


def _fit_epochs(model, state, cfg, train_batches, val_fn, ckpt_dir, mesh,
                step_fn, acc_fn, spd, multi_fn, acc_multi, results,
                log_every, start_epoch, best, best_epoch, last_path,
                pending, _join_pending):
    main = jax.process_index() == 0
    multiproc = mesh is not None and jax.process_count() > 1
    if multiproc:
        from ..parallel import distributed as DIST
    for epoch in range(start_epoch, cfg.epochs):
        acc = jnp.zeros((len(METRIC_KEYS),), jnp.float32)
        count = 0
        group: list = []
        last_ms: list = [None]   # per-step metrics of the last flushed group
        i = -1

        def flush(state, acc, count):
            if not group:
                return state, acc, count
            if len(group) == spd:
                state, ms = multi_fn(state, stack_batches(group))
                acc = acc_multi(acc, ms)
                last_ms[0] = ms
            else:  # short epoch tail: per-step programs
                for b in group:
                    state, m = step_fn(state, b)
                    acc = acc_fn(acc, m)
            count += len(group)
            group.clear()
            return state, acc, count

        # log cadence in GROUPS: ~log_every steps between prints whatever
        # spd is; metrics_dict is a synchronous D2H fetch, and fetching
        # every group would serialize the dispatch pipeline multi-step
        # dispatch exists to amortize (ADVICE r03 #3)
        log_every_groups = max(1, round(log_every / spd))
        for i, batch in enumerate(train_batches(epoch)):
            if epoch == start_epoch and i == 0 and main \
                    and getattr(cfg, "plots", True):
                # engine `plots=True` parity: augmented first-batch mosaic
                # (one host fetch, once per fit)
                from ..utils.plots import plot_train_batch

                plot_train_batch(batch, os.path.join(
                    ckpt_dir, "train_batch0.jpg"))
            if mesh is not None:
                # multi-process: `batch` is this process's LOCAL rows;
                # assemble the global sharded array (DDP input semantics)
                batch = (DIST.host_local_batch_to_global(batch, mesh)
                         if multiproc else PM.shard_batch(batch, mesh))
            if spd > 1:
                group.append(batch)
                if len(group) == spd:
                    do_log = main and \
                        ((i + 1) // spd - 1) % log_every_groups == 0
                    state, acc, count = flush(state, acc, count)
                    if do_log:
                        m = metrics_dict(last_ms[0][-1])
                        print(f"epoch {epoch} step {i}: "
                              f"loss={m['loss']:.4f} box={m['box']:.4f} "
                              f"cls={m['cls']:.4f} dfl={m['dfl']:.4f}")
                continue
            state, metrics = step_fn(state, batch)
            acc = acc_fn(acc, metrics)
            if main and i % log_every == 0:
                m = metrics_dict(metrics)
                print(f"epoch {epoch} step {i}: "
                      f"loss={m['loss']:.4f} box={m['box']:.4f} "
                      f"cls={m['cls']:.4f} dfl={m['dfl']:.4f}")
            count += 1
        if spd > 1:
            state, acc, count = flush(state, acc, count)
        fitness = float(val_fn(state)) if val_fn is not None else 0.0
        if results is not None:   # process 0 only (None on other hosts)
            sums = metrics_dict(acc)
            lr_now = float(schedule_hypers(
                np.asarray(state.sched), int(state.step))["lr"])
            results.append(
                epoch=epoch, fitness=fitness, lr=lr_now,
                **{k: (sums[k] / max(count, 1)) for k in sums})
        meta = {"model_scale": cfg.model_scale, "channels": cfg.channels,
                "tile_size": cfg.tile_size}
        jobs = []
        if fitness > best:
            best, best_epoch = fitness, epoch
            jobs.append((os.path.join(ckpt_dir, "best.ckpt"),
                         {"epoch": epoch, "fitness": fitness, **meta}))
        jobs.append((last_path,
                     {"epoch": epoch, "fitness": fitness,
                      "best_fitness": best, "best_epoch": best_epoch,
                      **meta}))
        # async save: pack the state on device (fast, freshly-allocated
        # buffers), then fetch/pickle/write in a background thread while
        # the next epoch trains — checkpoint D2H was 60-120 s/epoch for
        # the x-scale when fetched leaf-by-leaf in the loop
        # the snapshot program must run on EVERY process (computations on
        # a non-fully-addressable mesh are SPMD launches); only process 0
        # fetches the replicated pack and writes the files
        snap = device_state_snapshot(state)
        if main:
            _join_pending()
            saver = _AsyncSaver(snap, jobs)
            pending.append(saver)
            saver.start()
        if epoch - best_epoch >= cfg.patience:
            if main:
                print(f"[EarlyStop] no improvement for {cfg.patience} "
                      f"epochs (best fitness {best:.4f} @ epoch "
                      f"{best_epoch})")
            break
    return state
