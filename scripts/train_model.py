#!/usr/bin/env python
"""Train the Flax YOLO-seg model on the sidewalk dataset (TPU).

Counterpart of the reference's model/train.py (ultralytics one-liner), with
the same recipe defaults: 640 imgsz, SGD, mosaic until the last 10 epochs.

Usage:
  python scripts/train_model.py --data /root/reference/model --epochs 100 \
      --batch 32 --out runs/seg1 [--arch yolov8n-seg] [--eval-every 10]
"""

from __future__ import annotations

import argparse
import faulthandler
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/reference/model")
    ap.add_argument("--arch", default="yolov8n-seg")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--lr0", type=float, default=0.01)
    ap.add_argument("--close-mosaic", type=int, default=10)
    # Round-4 recipe levers (default 0 = the reference recipe exactly).
    ap.add_argument("--copy-paste", type=float, default=0.0,
                    help="per-sample probability of pasting donor instances")
    ap.add_argument("--degrees", type=float, default=0.0,
                    help="random rotation range (deg)")
    ap.add_argument("--shear", type=float, default=0.0,
                    help="random shear range (deg)")
    ap.add_argument("--perspective", type=float, default=0.0,
                    help="random projective coefficient range (~0.0005)")
    ap.add_argument("--train-split", default="train",
                    help="training split(s); 'train+test' adds the 530 "
                         "labelled test frames (valid stays eval-only)")
    ap.add_argument("--wire-format", choices=["bgr", "i420"], default="bgr",
                    help="batch image format over the relay; i420 ships "
                         "2.13x fewer bytes (and leaks 2.13x less host RSS) "
                         "with on-device conversion, PERFORMANCE.md Round 3b")
    ap.add_argument("--eval-every", type=int, default=10)
    ap.add_argument("--eval-images", type=int, default=256)
    ap.add_argument("--out", default="runs/seg")
    ap.add_argument("--workers", type=int, default=6)
    ap.add_argument("--cache-images", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="cache decoded images in RAM (--no-cache-images "
                         "for large datasets on RSS-constrained hosts)")
    ap.add_argument("--resume", default=None,
                    help="msgpack checkpoint to initialise params from")
    ap.add_argument("--resume-state", default=None,
                    help="orbax TrainState checkpoint for EXACT resume "
                         "(params+EMA+optimizer+step)")
    ap.add_argument("--save-state-every", type=int, default=0,
                    help="save a full TrainState checkpoint every N epochs")
    ap.add_argument("--sync-every", type=int, default=8,
                    help="block on device results every N steps (bounds the "
                         "async queue; this TPU relay stalls when hundreds of "
                         "executions are in flight)")
    ap.add_argument("--max-rss-gb", type=float, default=60.0,
                    help="exit 42 (supervised restart, exact resume) when "
                         "host RSS exceeds this — the remote relay client "
                         "leaks per-step host buffers we cannot free")
    ap.add_argument("--watchdog-secs", type=int, default=600,
                    help="abort (exit 42) if no step completes for this long; "
                         "scripts/train_supervised.sh restarts + resumes")
    args = ap.parse_args()

    # Multi-host scale-out is one env var away (VAT_COORDINATOR; no-op
    # otherwise) — must run before the first jax backend touch.
    from vision_assist_tpu.parallel.distributed import maybe_initialize
    multi = maybe_initialize()

    import jax
    import jax.numpy as jnp

    from vision_assist_tpu.utils.cache import enable as enable_cache
    enable_cache()
    from flax import serialization
    from flax.core import freeze

    from vision_assist_tpu.data.dataset import SegDataset
    from vision_assist_tpu.data.loader import BatchLoader
    from vision_assist_tpu.models.checkpoint import load_variables, save_variables
    from vision_assist_tpu.models.evaluate import evaluate
    from vision_assist_tpu.models.losses import LossConfig
    from vision_assist_tpu.models.train import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )
    from vision_assist_tpu.models.yolo import YoloSeg

    faulthandler.dump_traceback_later(900, repeat=True)

    import os
    import threading
    # Startup (dataset caching + train-state init + first remote compile,
    # which alone can take 15 min on this relay) must not trip the stall
    # watchdog: run with a generous limit until the first step completes,
    # then tighten to --watchdog-secs. Restarting during startup would loop
    # forever since the compile cache does not persist across processes.
    # Single-slot (timestamp, limit) tuple: rebinding one dict value is atomic
    # under the GIL, so the watchdog never pairs a stale timestamp with a
    # freshly-tightened limit.
    progress = {"mark": (time.time(), max(args.watchdog_secs, 2400))}

    def watchdog():
        while True:
            time.sleep(30)
            t, limit = progress["mark"]
            if time.time() - t > limit:
                print(f"WATCHDOG: no progress for {limit}s, "
                      "aborting for supervised restart", flush=True)
                os._exit(42)

    threading.Thread(target=watchdog, daemon=True).start()

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    print("device:", jax.devices()[0], flush=True)
    # Machine-readable recipe snapshot (the reference ships args.yaml per
    # run — model/runs/segment/train*/args.yaml). Downstream promotion
    # reads train_split from here so recipe provenance (extra-data runs
    # vs the reference's train-only protocol, ADVICE r4) is structural,
    # not a free-text note.
    if jax.process_index() == 0:
        (out / "args.json").write_text(json.dumps(
            {k: str(v) if isinstance(v, pathlib.Path) else v
             for k, v in vars(args).items()}, indent=1))
    # Host-side artifacts (eval, history.json, checkpoints, the state
    # rotation) are rank-0 work: concurrent writers on a shared cwd race
    # the exists()/rename rotation, and evals would run pcount times.
    # Collapse-revert DECISIONS stay on every process — their inputs (the
    # psum'd global step metrics) are identical, so the processes act in
    # lockstep without any cross-host file dependence.
    is_main = jax.process_index() == 0

    ds = SegDataset(args.data, args.train_split,
                    cache_images=args.imgsz if args.cache_images else None)
    # Per-process data sharding (parallel/distributed.py): each process loads
    # only its slice of the global batch; slices are assembled into global
    # dp-sharded jax.Arrays below. Single-process: identity.
    from vision_assist_tpu.parallel.distributed import (
        globalize_batch,
        local_loader_params,
    )
    local_bs, local_seed = local_loader_params(args.batch, seed=0)
    from vision_assist_tpu.data.augment import AugmentConfig
    aug = AugmentConfig(copy_paste=args.copy_paste, degrees=args.degrees,
                        shear=args.shear, perspective=args.perspective)
    loader = BatchLoader(ds, batch_size=local_bs, imgsz=args.imgsz,
                         augment=True, seed=local_seed, aug=aug,
                         wire_format=args.wire_format)
    steps_per_epoch = len(ds) // args.batch  # GLOBAL steps per epoch
    if steps_per_epoch == 0:
        raise SystemExit(f"--batch {args.batch} exceeds the dataset "
                         f"({len(ds)} images): zero steps per epoch")
    if multi:
        from vision_assist_tpu.parallel.mesh import make_mesh, replicated
        mesh = make_mesh()
        # Params/optimizer replicated across the global mesh; XLA psums the
        # dp-axis gradients over ICI/DCN.
        place_state = lambda s: jax.device_put(s, replicated(mesh))
    else:
        mesh = None
    cfg = TrainConfig(epochs=args.epochs, batch_size=args.batch,
                      imgsz=args.imgsz, lr0=args.lr0,
                      wire_format=args.wire_format)
    model = YoloSeg(arch=args.arch, num_classes=1)
    print(f"dataset cached; creating train state...", flush=True)
    t0 = time.time()
    state = create_train_state(model, jax.random.PRNGKey(0), cfg,
                               steps_per_epoch)
    if multi:
        state = place_state(state)
    jax.block_until_ready(state.params)
    print(f"train state ready in {time.time() - t0:.1f}s", flush=True)
    if args.resume:
        restored = load_variables(args.resume)
        state = state.replace(
            params=serialization.from_state_dict(state.params,
                                                 restored["params"]),
            ema_params=serialization.from_state_dict(state.ema_params,
                                                     restored["params"]),
            batch_stats=serialization.from_state_dict(state.batch_stats,
                                                      restored["batch_stats"]))
        print(f"resumed params from {args.resume}", flush=True)
    if args.resume_state:
        from vision_assist_tpu.models.checkpoint import load_train_state
        state = load_train_state(args.resume_state, state)
        print(f"resumed full train state from {args.resume_state} "
              f"(step {int(state.step)})", flush=True)
    if multi and (args.resume or args.resume_state):
        # Both resume paths overwrite the mesh-placed leaves with host-local
        # numpy; a multi-process step over the global mesh cannot
        # auto-globalize those, so re-place. (Single-process jit handles
        # numpy leaves fine.)
        state = place_state(state)

    step = make_train_step(model, LossConfig(), cfg)
    history = []
    if (out / "history.json").exists():
        history = json.loads((out / "history.json").read_text())
    best_map = max((h.get("map50_mask", -1.0) for h in history), default=-1.0)
    start_epoch = int(state.step) // max(steps_per_epoch, 1)
    if start_epoch:
        print(f"continuing at epoch {start_epoch + 1}", flush=True)

    for epoch in range(start_epoch, args.epochs):
        # <= not ==: a supervisor restart inside the closed-mosaic window
        # builds a fresh loader (mosaic_enabled=True) at an epoch where the
        # equality never fires again, silently re-opening mosaic for the
        # final anneal — the exact epochs it must stay closed.
        if args.epochs - epoch <= args.close_mosaic and loader.mosaic_enabled:
            loader.mosaic_enabled = False
            print("mosaic closed", flush=True)

        t0 = time.time()
        losses = []
        for si, batch in enumerate(loader.epoch(workers=args.workers)):
            if si >= steps_per_epoch:
                break  # local loader yields pcount x the global step count
            if multi:
                batch = globalize_batch(batch, mesh)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step(state, batch)
            losses.append(metrics)
            if (si + 1) % args.sync_every == 0:
                jax.block_until_ready(metrics["loss"])
                progress["mark"] = (time.time(), args.watchdog_secs)
        jax.block_until_ready(losses[-1]["loss"])
        progress["mark"] = (time.time(), args.watchdog_secs)
        # ONE bulk fetch: float(m[k]) per metric per step would be
        # steps_per_epoch x 6 sequential relay round-trips every epoch.
        losses = jax.device_get(losses)
        mean = {k: float(np.mean([m[k] for m in losses])) for k in losses[0]}
        dt = time.time() - t0
        line = (f"epoch {epoch + 1}/{args.epochs} "
                f"loss={mean['loss']:.3f} box={mean['box']:.3f} "
                f"seg={mean['seg']:.3f} cls={mean['cls']:.3f} "
                f"dfl={mean['dfl']:.3f} [{dt:.1f}s, "
                f"{steps_per_epoch * args.batch / dt:.1f} img/s]")
        print(line, flush=True)
        record = {"epoch": epoch + 1, **mean, "time_s": dt}

        is_last = epoch + 1 == args.epochs
        if is_main and ((epoch + 1) % args.eval_every == 0 or is_last):
            ema_vars = freeze({"params": state.ema_params,
                               "batch_stats": state.batch_stats})
            # The eval program is a separate remote compile (can take 15 min
            # the first time) — widen the stall limit for its duration.
            progress["mark"] = (time.time(), max(args.watchdog_secs, 2400))
            m = evaluate(model, ema_vars, args.data, "valid",
                         imgsz=args.imgsz,
                         max_images=None if is_last else args.eval_images)
            progress["mark"] = (time.time(), args.watchdog_secs)
            print(f"  val: mAP50(M)={m['map50_mask']:.4f} "
                  f"mAP50-95(M)={m['map50_95_mask']:.4f} "
                  f"mAP50(B)={m['map50_box']:.4f}", flush=True)
            record.update(m)
            if m["map50_mask"] > best_map:
                best_map = m["map50_mask"]
                save_variables(out / "best.msgpack",
                               {"params": state.ema_params,
                                "batch_stats": state.batch_stats})
        # Collapse guard: from-scratch bf16 training can blow up (one bad
        # step at mid-schedule lr) and fall into the self-reinforcing
        # "predict nothing" state — observed at epoch 40 of the round-2 v8n
        # run (fg/img 3.3 -> 0.05, eval mAP -> 0). Detect the signature
        # (foreground collapse or loss spike vs the recent healthy median)
        # and revert to the previous epoch's full TrainState; the loader's
        # rng stream has advanced, so the retried epochs see fresh batches.
        healthy = [h for h in history[-8:] if not h.get("reverted")]
        # Only rank 0 writes out/state, so on a multi-process run the
        # availability bit must come from rank 0 (ADVICE r3: a local
        # exists() check desynchronizes the revert decision when $OUT is
        # not a shared filesystem — rank 0 reverts, the others advance,
        # and the next collective hangs/diverges).
        state_avail = (out / "state").exists()
        if multi:
            from jax.experimental import multihost_utils
            state_avail = bool(multihost_utils.broadcast_one_to_all(
                np.asarray(state_avail)))
        if len(healthy) >= 4 and state_avail:
            med_loss = float(np.median([h["loss"] for h in healthy]))
            med_fg = float(np.median([h["fg_per_img"] for h in healthy]))
            collapsed = (not np.isfinite(mean["loss"])
                         or mean["fg_per_img"] < 0.5 * med_fg
                         or mean["loss"] > 1.6 * med_loss)
            if collapsed:
                from vision_assist_tpu.models.checkpoint import (
                    load_train_state,
                )
                print(f"COLLAPSE at epoch {epoch + 1}: "
                      f"loss {mean['loss']:.1f} (median {med_loss:.1f}), "
                      f"fg/img {mean['fg_per_img']:.2f} (median "
                      f"{med_fg:.2f}) — reverting to previous epoch state",
                      flush=True)
                record["reverted"] = True
                history.append(record)
                if is_main:
                    tmp = out / "history.json.tmp"
                    tmp.write_text(json.dumps(history, indent=1))
                    tmp.replace(out / "history.json")
                if multi and not (out / "state").exists():
                    # The decision was synchronized from rank 0, but this
                    # rank cannot perform the restore: loud failure beats a
                    # silent desync (every rank must see the checkpoint).
                    raise RuntimeError(
                        "collapse-revert in multi-process mode requires "
                        f"$OUT ({out}) on a filesystem shared by all "
                        "processes; out/state is missing on rank "
                        f"{jax.process_index()}")
                state = load_train_state(out / "state", state)
                if multi:  # restored leaves are host-local; re-place
                    state = place_state(state)
                continue

        history.append(record)
        # tmp+rename: a concurrent reader (checkpoint snapshotter, resume)
        # must never see a torn half-written JSON.
        if is_main:
            tmp = out / "history.json.tmp"
            tmp.write_text(json.dumps(history, indent=1))
            tmp.replace(out / "history.json")
        if is_main and args.save_state_every \
                and (epoch + 1) % args.save_state_every == 0:
            from vision_assist_tpu.models.checkpoint import save_train_state
            # Write-new-then-swap: a crash mid-save must never leave a torn
            # orbax dir where the resume path (supervisor: --resume-state
            # $OUT/state) expects a valid checkpoint.
            import shutil
            new = out / "state_new"
            if new.exists():
                shutil.rmtree(new)
            save_train_state(new, state)
            prev = out / "state_prev"
            if prev.exists():
                shutil.rmtree(prev)
            if (out / "state").exists():
                (out / "state").rename(prev)
            new.rename(out / "state")
        if is_main:
            save_variables(out / "last.msgpack",
                           {"params": state.ema_params,
                            "batch_stats": state.batch_stats})
        # Host-RSS hygiene: the experimental TPU relay client leaks host
        # memory per executed step (measured ~4.8 GB/epoch at 640px — the
        # per-batch upload size), which OOM-killed a 640px run at epoch 27
        # with 130 GB anon-RSS. A leak we don't own is handled by planned
        # restart: save-state runs every epoch, so exit 42 here and let
        # scripts/train_supervised.sh resume exactly.
        rss_gb = _rss_gb()
        print(f"  host rss: {rss_gb:.1f} GB", flush=True)
        if rss_gb > args.max_rss_gb:
            print(f"RSS {rss_gb:.1f} GB > --max-rss-gb {args.max_rss_gb}; "
                  "restarting for memory hygiene", flush=True)
            return 42
    return 0


def _rss_gb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0


if __name__ == "__main__":
    sys.exit(main())
