"""Command-line entry points.

Replaces the reference's edit-the-source configuration (`Train_OBB.py:19-42`,
`Detect_OBB.py:23-72`) with argparse over the typed configs:

  python -m oriented_object_detection_tpu.cli detect \
      --input Input --output Output --ckpt128 runs/obb/train128/best.ckpt \
      --ckpt416 runs/obb/train416/best.ckpt [--metrics] [--channels 4]

  python -m oriented_object_detection_tpu.cli train \
      --data-root datasets/GeoMap --tile-size 416 --overlap 100 \
      --epochs 150 --batch-size 16 [--channels 4] [--scale x]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time


def _detect(args):
    # multi-host inference DP: join the runtime BEFORE any backend touch
    # (same ordering rule as `oodt train --dist`)
    if getattr(args, "dist", False):
        from .parallel import distributed as DIST

        DIST.initialize(coordinator_address=args.coordinator,
                        num_processes=args.num_processes,
                        process_id=args.process_id)

    import cv2  # noqa: F401  (fail early if unavailable)
    import jax

    from .utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from .config import DetectConfig, ScaleConfig
    from .eval.metrics import run_fusion_eval
    from .infer.pipeline import TiledDetector, process_image
    from .models import YOLO11OBB

    # scale geometry: either --scales "128:30=ck.ckpt,416:100=ck2.ckpt"
    # (the reference's editable tile_sizes/overlaps lists,
    # `Detect_OBB.py:24-25`) or the --ckpt128/--ckpt416 shorthands with
    # the reference's default overlaps (30, 100).
    if args.scales:
        triples = []
        for item in args.scales.split(","):
            geom, _, ck = item.partition("=")
            ts_s, _, ov_s = geom.partition(":")
            if not ov_s:
                raise SystemExit(
                    f"bad --scales item {item!r}; want ts:ov[=ckpt]")
            triples.append((int(ts_s), int(ov_s), ck or None))
    else:
        triples = [(128, 30, args.ckpt128), (416, 100, args.ckpt416)]

    scales = []
    params = {}
    for ts, ov, ck in triples:
        if ck is None and not args.scales:
            continue
        model_scale = args.scale
        if ck and os.path.exists(ck):
            from .train.trainer import load_checkpoint

            ckd = load_checkpoint(ck)
            extra = ckd.get("extra", {})
            # arch metadata checks: a channel mismatch is a hard error
            # (different stem shape — flax would die with a cryptic
            # shape mismatch deep in apply); the checkpoint's recorded
            # model scale wins over --scale (same rule as bench)
            ck_ch = extra.get("channels")
            if ck_ch is not None and int(ck_ch) != args.channels:
                raise SystemExit(
                    f"checkpoint {ck} was trained with channels={ck_ch} "
                    f"but --channels {args.channels} was requested")
            ck_sc = extra.get("model_scale")
            if ck_sc and ck_sc != model_scale:
                print(f"[detect] scale {ts}: using the checkpoint's "
                      f"recorded model_scale={ck_sc} (over --scale "
                      f"{model_scale})")
                model_scale = ck_sc
            ck_ts = extra.get("tile_size")
            if ck_ts and int(ck_ts) != ts:
                print(f"[WARN] checkpoint {ck} was trained at tile_size="
                      f"{ck_ts}; running it at {ts} (fully "
                      "convolutional, but detection quality follows "
                      "the training scale)")
            p = ckd["ema_params"] if ckd.get("ema_params") is not None \
                else ckd["params"]
            params[ts] = {"params": p, "batch_stats": ckd["batch_stats"]}
        else:
            if ck:
                # a NAMED checkpoint that does not exist is an error (a
                # typo'd path must not silently degrade to random
                # weights); --allow-random opts into the degradation
                if not args.allow_random:
                    raise SystemExit(
                        f"checkpoint {ck} for scale {ts} does not exist "
                        "(pass --allow-random to run with random init "
                        "anyway)")
                print(f"[WARN] checkpoint {ck} missing; random init "
                      "(--allow-random)")
            else:
                print(f"[WARN] no checkpoint given for scale {ts}; "
                      "random init")
            m = YOLO11OBB(nc=12, scale=args.scale,
                          in_channels=args.channels)
            import jax.numpy as jnp
            params[ts] = m.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, ts, ts, args.channels)))
        scales.append(ScaleConfig(ts, ov, checkpoint=ck,
                                  model_scale=model_scale))
    if not scales:
        raise SystemExit("provide --ckpt128 and/or --ckpt416")
    sizes = [sc.tile_size for sc in scales]
    if len(set(sizes)) != len(sizes):
        # params/models/dispatches are keyed by tile size; duplicates
        # would silently collapse to the last entry
        raise SystemExit(f"duplicate tile sizes in --scales: {sizes}")

    cfg = DetectConfig(scales=tuple(scales), channels=args.channels,
                       calculate_metrics=args.metrics,
                       merge_iou=args.merge_iou,
                       metrics_iou=args.metrics_iou,
                       map_min_score=args.map_min_score,
                       apply_border_filter=not args.no_border_filter,
                       margin_128=args.margin_128,
                       margin_416=args.margin_416)
    mesh = None
    main = True
    if getattr(args, "dist", False):
        from .parallel import mesh as PM

        mesh = PM.make_mesh()   # tile batch sharded over ALL global devs
        main = jax.process_index() == 0
        if not (args.batch or args.stream or args.chunk):
            # the per-image path writes artifacts inside process_image;
            # multi-host runs use the batched SPMD path where RANK-0
            # gating is explicit
            args.batch = True
            if main:
                print("[detect] --dist implies --batch")
    det = TiledDetector(cfg, params, mesh=mesh)

    if main:
        os.makedirs(args.output, exist_ok=True)
    t0 = time.time()
    store: dict = {}
    import contextlib

    _stack = contextlib.ExitStack()
    if mesh is not None:
        _stack.enter_context(mesh)   # dispatches shard over the mesh
    names = [f for f in sorted(os.listdir(args.input))
             if f.lower().endswith(
                 (".jpg", ".png", ".jpeg", ".tif", ".tiff"))]
    if args.batch or args.stream or args.chunk:
        import cv2 as _cv2

        from .infer.pipeline import (draw_detections, export_xlsx)

        paths = [os.path.join(args.input, f) for f in names]
        imgs = [_cv2.imread(p) for p in paths]
        ok = [(p, im) for p, im in zip(paths, imgs) if im is not None]
        if args.chunk:
            # pipelined chunked stream, grouped by image shape: every
            # distinct chunk image-shape set compiles its own device
            # program (~20-90 s through the remote-compile tunnel), so
            # same-shape maps are grouped into full chunks (short tails
            # padded with a repeat — padded results are discarded by the
            # zip below) and each shape compiles exactly once
            def chunked_results():
                by_shape: dict = {}
                for p, im in ok:
                    by_shape.setdefault(im.shape, []).append((p, im))
                for group in by_shape.values():
                    imgs_g = [im for _, im in group]
                    pad = (-len(imgs_g)) % args.chunk
                    res_g = det.detect_stream(imgs_g + [imgs_g[-1]] * pad,
                                              chunk=args.chunk)
                    yield from zip(group, res_g)
            pairs = chunked_results()
        elif args.stream:
            # pipelined per-map: map k+1's H2D transfer (throttled
            # ~35 MB/s on this box) rides under map k's compute+fetch —
            # the fast path for LARGE maps
            pairs = zip(ok, det.detect_stream([im for _, im in ok]))
        else:
            # scale-grouped batching: one device program per scale
            # covers every image — the fast path for MANY SMALL maps
            # (amortizes the fixed per-program tunnel RPC)
            pairs = zip(ok, det.detect_images([im for _, im in ok]))
        for (p, im), res in pairs:
            stem = os.path.splitext(os.path.basename(p))[0]
            merged = res["merged_for_pr"]
            store.setdefault("pr", {})[p] = merged
            if "merged_for_map" in res:
                store.setdefault("map", {})[p] = res["merged_for_map"]
            if not main:   # rank-0 artifact gating (multi-host detect)
                continue
            _cv2.imwrite(os.path.join(args.output,
                                      f"{stem}_detected.jpg"),
                         draw_detections(im, merged))
            export_xlsx(os.path.join(args.output, f"{stem}.xlsx"), merged)
            print(f"Results saved for {os.path.basename(p)}")
    else:
        for fname in names:
            print(f"Processing {fname}...")
            process_image(det, os.path.join(args.input, fname),
                          args.output, store=store)
            print(f"Results saved for {fname}")
    _stack.close()
    if main:
        print(f"--- {time.time() - t0:.2f} seconds ---")

    if args.metrics and main:
        try:
            run_fusion_eval(store.get("pr", {}), args.input, args.output,
                            iou_thr=cfg.metrics_iou,
                            dets_map=store.get("map"),
                            single_scale=len(scales) == 1,
                            map_min_score=cfg.map_min_score)
        except Exception as e:  # same guard as the reference main
            print(f"[Eval] Skipped due to error: {e}")


def _train(args):
    # join the multi-process runtime FIRST (before any backend touch):
    # the reference's DDP launch (Train_OBB.py:39-42) becomes
    # jax.distributed here — on TPU pods the coordinator auto-detects,
    # on CPU/test rigs pass --coordinator/--num-processes/--process-id
    if getattr(args, "dist", False):
        from .parallel import distributed as DIST

        DIST.initialize(coordinator_address=args.coordinator,
                        num_processes=args.num_processes,
                        process_id=args.process_id)

    import jax
    import numpy as np

    from .utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from .config import TrainConfig
    from .data import dataset as DS
    from .data.loader import TileDataset
    from .parallel import mesh as PM
    from .train import trainer as TR
    from .train.loss import LossConfig

    cfg = TrainConfig(
        tile_size=args.tile_size, overlap=args.overlap,
        epochs=args.epochs, batch_size=args.batch_size,
        channels=args.channels, model_scale=args.scale,
        need_cropping=not args.skip_cropping,
        need_augmentation=not args.skip_augmentation,
        # channels==4 implies the DT-Edge TIFF build: the 4ch stem needs
        # 4ch inputs (`Train_OBB.py:763-787` gates on APPLY_FILTERED_RGB;
        # our flag mirrors it but defaults on for 4ch training)
        apply_filtered_rgb=args.channels == 4 or args.filtered_rgb,
        steps_per_dispatch=args.steps_per_dispatch)
    if args.close_mosaic is not None:
        cfg = dataclasses.replace(cfg, close_mosaic=args.close_mosaic)

    root = args.data_root
    ts = cfg.tile_size
    dirs = {
        "img": f"{root}/images/train", "lbl": f"{root}/labels/train",
        "oimg": f"{root}/cropped{ts}/images/train",
        "olbl": f"{root}/cropped{ts}/labels/train",
        "vimg": f"{root}/images/val", "vlbl": f"{root}/labels/val",
        "voimg": f"{root}/cropped{ts}/images/val",
        "volbl": f"{root}/cropped{ts}/labels/val",
    }
    train_list = f"{root}/train_cropped{ts}.txt"
    val_list = f"{root}/val_cropped{ts}.txt"

    # multi-process: the tiling/augmentation/TIFF preprocessing writes
    # shared files — process 0 does it alone, everyone else waits at the
    # barrier below (the reference's DDP equivalent: RANK-0 dataset prep)
    main = jax.process_index() == 0
    if cfg.need_cropping and main:
        stats = DS.build_train_tiles(
            dirs["img"], dirs["lbl"], dirs["oimg"], dirs["olbl"],
            train_list, ts, cfg.overlap,
            cfg.object_boundary_threshold)
        if cfg.need_augmentation:
            DS.balance_classes(
                dirs["oimg"], dirs["olbl"], train_list,
                cfg.class_balance_threshold, cfg.augmentation_repeats,
                seed=cfg.seed)
        P_post = DS.count_positives(dirs["olbl"])
        E_total = stats["E_total"]
        frac = min(1.0, cfg.r_target * P_post / E_total) \
            if E_total > 0 else 0.0
        print(f"[TRAIN] AUTO keep_fraction computed: {frac:.4f} "
              f"(R_TARGET={cfg.r_target}, P_post={P_post:,}, "
              f"E_total={E_total:,})")
        DS.save_selected_empty_tiles(stats["empty_meta_path"], frac,
                                     train_list, rng_seed=cfg.seed)
        DS.build_val_tiles(
            dirs["vimg"], dirs["vlbl"], dirs["voimg"], dirs["volbl"],
            val_list, ts, cfg.overlap,
            boundary_threshold=cfg.object_boundary_threshold,
            r_target=cfg.r_target)

    if cfg.channels == 4 and cfg.apply_filtered_rgb:
        if main:
            tr = DS.convert_folder_to_4ch_tiff(
                dirs["oimg"], f"{root}/cropped4/images/train")
            va = DS.convert_folder_to_4ch_tiff(
                dirs["voimg"], f"{root}/cropped4/images/val")
            DS.mirror_labels_by_stem(
                dirs["olbl"], f"{root}/cropped4/labels/train",
                [os.path.splitext(os.path.basename(p))[0] for p in tr])
            DS.mirror_labels_by_stem(
                dirs["volbl"], f"{root}/cropped4/labels/val",
                [os.path.splitext(os.path.basename(p))[0] for p in va])
            DS.update_list_file(f"{root}/train_cropped_4ch.txt", tr)
            DS.update_list_file(f"{root}/val_cropped_4ch.txt", va)
        train_list = f"{root}/train_cropped_4ch.txt"
        val_list = f"{root}/val_cropped_4ch.txt"

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("oodt_preprocess_done")

    train_ds = TileDataset(train_list, ts, cfg.channels)
    val_ds = TileDataset(val_list, ts, cfg.channels)
    steps_per_epoch = max(1, len(train_ds) // cfg.batch_size)
    if main:
        print(f"[TRAIN] {len(train_ds)} train tiles, {len(val_ds)} val "
              f"tiles, {steps_per_epoch} steps/epoch")

    model, state, tx = TR.create_train_state(
        cfg, jax.random.PRNGKey(cfg.seed), steps_per_epoch)
    if jax.process_count() > 1:
        # the mesh must SPAN the processes (make_mesh's first-k-global
        # device pick would land entirely on process 0 for small k)
        from .parallel import distributed as DIST

        mesh = DIST.make_global_data_mesh(cfg.batch_size)
    else:
        n_data = PM.best_data_axis_size(cfg.batch_size)
        mesh = PM.make_mesh(n_data=n_data) if n_data > 1 else None

    rng = np.random.RandomState(cfg.seed)

    from .data.loader import mosaic_p_for_epoch

    closed = []

    def train_batches(epoch):
        mp = mosaic_p_for_epoch(epoch, cfg.epochs, cfg.close_mosaic)
        if mp == 0.0 and not closed:
            closed.append(epoch)
            if main:
                print(f"[close_mosaic] mosaic disabled for the final "
                      f"{cfg.close_mosaic} epochs (engine default)")
        return train_ds.batches(cfg.batch_size, rng, augment=True,
                                mosaic_p=mp)

    procs = jax.process_count()
    if procs > 1:
        # every process builds the SAME deterministic global batch stream
        # (same lists, same seed) and feeds fit() its local row slice;
        # fit() reassembles the global sharded array per step
        if cfg.batch_size % procs:
            raise SystemExit(f"--batch-size {cfg.batch_size} must divide "
                             f"by the {procs} processes")
        pid, rows = jax.process_index(), cfg.batch_size // procs
        _global_batches = train_batches

        def train_batches(epoch, _g=_global_batches):
            for b in _g(epoch):
                yield {k: v[pid * rows:(pid + 1) * rows]
                       for k, v in b.items()}

    from .eval.val import validate_tiles

    def val_fn(s):
        if procs > 1:
            # validate_tiles runs per-process local programs: feed it a
            # host snapshot of the (replicated) global state — identical
            # on every process, so fitness/early-stop stay consistent
            s = jax.tree.map(np.asarray, s)
        return validate_tiles(model, s, val_ds, cfg)

    ckpt_dir = args.ckpt_dir or f"runs/obb/train{ts}"
    TR.fit(model, state, tx, cfg, train_batches, val_fn=val_fn,
           ckpt_dir=ckpt_dir, mesh=mesh, resume=args.resume,
           init_ckpt=args.init_ckpt)


def _val(args):
    """Engine `model.val()` analogue: per-tile mAP@0.5 / mAP@[0.5:0.95]
    and the fitness (0.1*mAP50 + 0.9*mAP50-95) of a checkpoint over the
    val tile list built by `oodt train` (no full-map stitching — that is
    `oodt detect --metrics`)."""
    if getattr(args, "dist", False):
        from .parallel import distributed as DIST

        DIST.initialize(coordinator_address=args.coordinator,
                        num_processes=args.num_processes,
                        process_id=args.process_id)

    from types import SimpleNamespace

    from .utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from .config import TrainConfig
    from .data.loader import TileDataset
    from .eval.val import validate_tiles
    from .models import YOLO11OBB
    from .train.trainer import load_checkpoint

    ck = load_checkpoint(args.ckpt)
    extra = ck.get("extra", {})
    scale = extra.get("model_scale", args.scale)
    channels = int(extra.get("channels", args.channels))
    ts = int(extra.get("tile_size", args.tile_size))
    cfg = TrainConfig(tile_size=ts, channels=channels, model_scale=scale)

    val_list = args.val_list or (
        f"{args.data_root}/val_cropped_4ch.txt" if channels == 4
        else f"{args.data_root}/val_cropped{ts}.txt")
    if not os.path.exists(val_list):
        raise SystemExit(
            f"val list {val_list} not found — run `oodt train` (dataset "
            "build) for this tile size first, or pass --val-list")
    ds = TileDataset(val_list, ts, channels)

    model = YOLO11OBB(nc=cfg.nc, scale=scale, in_channels=channels)
    params = ck["ema_params"] if ck.get("ema_params") is not None \
        else ck["params"]
    state = SimpleNamespace(params=params, ema_params=params,
                            batch_stats=ck["batch_stats"])
    import jax

    fitness, comps = validate_tiles(
        model, state, ds, cfg, max_tiles=args.max_tiles,
        batch_size=args.batch_size, return_components=True,
        shard_across_processes=getattr(args, "dist", False))
    if jax.process_index() == 0:   # rank-0 report (every process holds
        print(f"[VAL] ckpt={args.ckpt} scale={scale} ts={ts} "  # the
              f"tiles={comps['n_tiles']}")    # identical global metric)
        print(f"[VAL] mAP@0.5={comps['mAP@0.5']:.4f} "
              f"mAP@[0.5:0.95]={comps['mAP@[0.5:0.95]']:.4f} "
              f"fitness={fitness:.4f}")
    return {"fitness": fitness, **comps}


def _convert(args):
    """Ultralytics .pt (or an .npz dump of its state dict) -> our ckpt.

    Completes the migration path for the reference's published fine-tuned
    weights (`/root/reference/README.md:183-188`, Google Drive): download
    best128/best416(.pt), convert, and detect with full parity harness
    support (tools/parity.py)."""
    import pickle

    import numpy as np

    from .models import YOLO11OBB
    from .models.weights import convert_state_dict, validate_against

    if args.pt.endswith(".npz"):
        sd = {k: np.asarray(v) for k, v in np.load(args.pt).items()}
    else:
        # torch-free restricted reader: parses the torch zip format
        # directly (pt_reader.py), resolving ultralytics/torch classes
        # to inert stubs — no torch install needed and, unlike
        # torch.load(weights_only=False), no checkpoint-embedded code
        # ever executes. Prefers the `ema` entry like the engine's
        # attempt_load_one_weight.
        from .models.pt_reader import read_pt_state_dict

        try:
            sd = read_pt_state_dict(args.pt)
        except ValueError as e:
            raise SystemExit(f"cannot read {args.pt}: {e}")
        print(f"[Convert] read {len(sd)} tensors (torch-free)")

    variables = convert_state_dict(
        sd, reverse_stem_channels=args.channels == 4)

    # validate coverage against a freshly-built model of the target shape
    import jax
    import jax.numpy as jnp

    m = YOLO11OBB(nc=args.nc, scale=args.scale, in_channels=args.channels)
    ref = m.init(jax.random.PRNGKey(0),
                 jnp.zeros((1, args.imgsz, args.imgsz, args.channels)))
    rep = validate_against(variables, ref)
    print(f"[Convert] matched {rep['matched']} arrays; "
          f"missing={len(rep['missing'])} extra={len(rep['extra'])} "
          f"mismatched={len(rep['mismatched'])}")
    if (rep["missing"] or rep["mismatched"]) and not args.force:
        for k in (rep["missing"] + rep["mismatched"])[:8]:
            print(f"  problem: {k}")
        raise SystemExit("conversion incomplete (use --force to write "
                         "anyway)")

    payload = {
        "step": 0,
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "ema_params": variables["params"],
        "extra": {"model_scale": args.scale, "channels": args.channels,
                  "tile_size": args.imgsz, "source": args.pt},
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(payload, f)
    print(f"[Convert] wrote {args.out}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="oodt")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("detect", help="tiled multi-scale OBB detection")
    d.add_argument("--input", default="Input")
    d.add_argument("--output", default="Output")
    d.add_argument("--ckpt128")
    d.add_argument("--ckpt416")
    d.add_argument("--scales",
                   help="custom scale geometry: comma list ts:ov[=ckpt], "
                        "e.g. 128:30=ck128.ckpt,416:100=ck416.ckpt "
                        "(replaces --ckpt128/--ckpt416)")
    d.add_argument("--channels", type=int, default=3, choices=(3, 4))
    d.add_argument("--scale", default="x")
    d.add_argument("--metrics", action="store_true")
    d.add_argument("--batch", action="store_true",
                   help="batch all input images per scale (fastest for "
                        "many small maps)")
    d.add_argument("--stream", action="store_true",
                   help="pipelined per-map detection: the next map's "
                        "host->device transfer overlaps the current "
                        "map's compute (fastest for large maps)")
    d.add_argument("--chunk", type=int, default=0,
                   help="pipelined chunked detection: N maps per device "
                        "program group, uploads and host fusion overlap "
                        "neighboring chunks' compute (fastest for map "
                        "folders; inputs are grouped by image shape so "
                        "each distinct shape compiles one program)")
    # the remaining Detect_OBB.py constants (`:33-40`)
    d.add_argument("--merge-iou", type=float, default=0.4,
                   help="merge NMS IoU (reference iou_threshold)")
    d.add_argument("--metrics-iou", type=float, default=0.25,
                   help="metrics IoU/conf threshold (reference iou_thr)")
    d.add_argument("--map-min-score", type=float, default=0.001)
    d.add_argument("--no-border-filter", action="store_true")
    d.add_argument("--allow-random", action="store_true",
                   help="fall back to random init when a named "
                        "checkpoint path does not exist (default: error)")
    d.add_argument("--margin-128", type=int, default=10)
    d.add_argument("--margin-416", type=int, default=20)
    d.add_argument("--dist", action="store_true",
                   help="multi-host inference DP: join a "
                        "jax.distributed runtime, shard the tile batch "
                        "over the GLOBAL mesh, write artifacts from "
                        "process 0 only (implies --batch)")
    d.add_argument("--coordinator", default=None,
                   help="coordinator host:port (auto-detected on TPU "
                        "pods; required for CPU/test rigs)")
    d.add_argument("--num-processes", type=int, default=None)
    d.add_argument("--process-id", type=int, default=None)
    d.set_defaults(fn=_detect)

    t = sub.add_parser("train", help="dataset build + training")
    t.add_argument("--dist", action="store_true",
                   help="join a jax.distributed multi-process runtime "
                        "(DDP analogue, Train_OBB.py:39-42): process 0 "
                        "preps data + writes artifacts, every process "
                        "feeds its local batch shard")
    t.add_argument("--coordinator", default=None,
                   help="coordinator host:port (auto-detected on TPU "
                        "pods; required for CPU/test rigs)")
    t.add_argument("--num-processes", type=int, default=None)
    t.add_argument("--process-id", type=int, default=None)
    t.add_argument("--data-root", default="datasets/GeoMap")
    t.add_argument("--tile-size", type=int, default=416)
    t.add_argument("--overlap", type=int, default=100)
    t.add_argument("--epochs", type=int, default=150)
    t.add_argument("--batch-size", type=int, default=16)
    t.add_argument("--channels", type=int, default=3, choices=(3, 4))
    t.add_argument("--scale", default="x")
    t.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="optimizer steps per device program (scan over "
                        "a stacked batch group); measured perf-neutral "
                        "on this box, an opt-in for environments with "
                        "real per-dispatch overhead. 1 = one program "
                        "per step")
    t.add_argument("--skip-cropping", action="store_true")
    t.add_argument("--skip-augmentation", action="store_true")
    t.add_argument("--filtered-rgb", action="store_true",
                   help="build the 4ch DT-Edge TIFF dataset "
                        "(implied by --channels 4)")
    t.add_argument("--resume", action="store_true",
                   help="resume from <ckpt-dir>/last.ckpt")
    t.add_argument("--init-ckpt",
                   help="warm-start params/EMA from a converted "
                        "checkpoint (the engine's pretrained "
                        "yolo11x-obb.pt start, Train_OBB.py:792); "
                        "step/schedule/optimizer start fresh")
    t.add_argument("--close-mosaic", type=int, default=None,
                   help="disable mosaic for the final N epochs "
                        "(engine default 10)")
    t.add_argument("--ckpt-dir")
    t.set_defaults(fn=_train)

    c = sub.add_parser("convert",
                       help="ultralytics .pt/.npz -> framework ckpt")
    c.add_argument("pt", help=".pt checkpoint or .npz state-dict dump")
    c.add_argument("--out", required=True, help="output .ckpt path")
    c.add_argument("--scale", default="x")
    c.add_argument("--channels", type=int, default=3, choices=(3, 4))
    c.add_argument("--nc", type=int, default=12)
    c.add_argument("--imgsz", type=int, default=416)
    c.add_argument("--force", action="store_true",
                   help="write even if some model arrays are missing")
    c.set_defaults(fn=_convert)

    v = sub.add_parser("val", help="per-tile val mAP/fitness of a "
                                   "checkpoint (engine model.val())")
    v.add_argument("--ckpt", required=True)
    v.add_argument("--data-root",
                   help="dataset root holding val_cropped{ts}.txt")
    v.add_argument("--val-list", help="explicit val tile list file "
                                      "(overrides --data-root)")
    v.add_argument("--tile-size", type=int, default=416,
                   help="fallback when the ckpt lacks tile_size metadata")
    v.add_argument("--channels", type=int, default=3, choices=(3, 4))
    v.add_argument("--scale", default="x",
                   help="fallback when the ckpt lacks model_scale")
    v.add_argument("--batch-size", type=int, default=16)
    v.add_argument("--max-tiles", type=int)
    v.add_argument("--dist", action="store_true",
                   help="multi-host val: each process infers a disjoint "
                        "tile shard, packed rows allgather, rank 0 "
                        "reports the (bit-identical) global metric")
    v.add_argument("--coordinator", default=None)
    v.add_argument("--num-processes", type=int, default=None)
    v.add_argument("--process-id", type=int, default=None)
    v.set_defaults(fn=_val)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
