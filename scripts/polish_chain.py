#!/usr/bin/env python
"""Stage-5 polish chain: low-LR no-mosaic fine-tune after the r3b chain.

Waits for scripts/round3b_chain.py to finish (both restart schedules
evaluated and promoted-or-kept), then runs a short "polish" fine-tune per
arch — the classic final-anneal recipe: init from the promoted best,
peak LR 1e-3 (10x below the restart schedules' 1e-2), cosine to ~1e-5,
mosaic closed for the WHOLE run. The round-2/3 extension lesson was that
mid-LR warm restarts regress a fully-annealed checkpoint; a true low-LR
polish is the monotone-safe variant, and promotion only ever replaces the
committed weights on a full-val improvement, so the downside is bounded
at zero.

Idempotent: each stage is skipped when its note is already recorded in
TRAINING_RESULTS.json, so the script can be relaunched after a crash.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import round3b_chain as chain  # noqa: E402  (shared stage helpers)

V8N_NOTE = ("no-mosaic polish: 30 epochs, lr0 1e-3 cosine from the "
            "promoted best (mosaic closed from epoch 0)")
Y11N_NOTE = ("no-mosaic polish: 60 epochs, lr0 1e-3 cosine from the "
             "promoted best (mosaic closed from epoch 0)")

V8N_ARGS = ["--epochs", "30", "--lr0", "0.001", "--close-mosaic", "30",
            "--eval-every", "10", "--eval-images", "256",
            "--max-rss-gb", "100", "--wire-format", "i420",
            "--resume", "assets/weights/v8n_640_best.msgpack"]
Y11N_ARGS = ["--arch", "yolo11n-seg", "--imgsz", "256", "--epochs", "60",
             "--batch", "64", "--lr0", "0.001", "--close-mosaic", "60",
             "--eval-every", "20", "--eval-images", "256",
             "--max-rss-gb", "100", "--wire-format", "i420",
             "--resume", "assets/weights/y11n_256_best.msgpack"]


def r3b_chain_alive() -> bool:
    """Exact-argv /proc scan (shared chain.chains_alive) — a pid file is
    only as reliable as the launcher that remembered to write it, and a
    missed interlock would run two chains' chip stages and
    TRAINING_RESULTS read-modify-writes concurrently."""
    return chain.chains_alive("round3b_chain.py", "levers_chain.py")


def stage_done(results_key: str, note_prefix: str) -> bool:
    result = json.loads(chain.RESULTS.read_text())
    section = result if results_key == "" else result[results_key]
    return any(r.get("note", "").startswith(note_prefix)
               for r in section.get("restart_runs", []))


def polish(results_key: str, note: str, run_name: str, snap: str,
           args: list[str], arch: str, imgsz: int, asset: str,
           epochs: int) -> bool:
    if stage_done(results_key, note.split(":")[0]):
        print(f"{run_name}: already recorded; skipping", flush=True)
        return False
    launch = lambda: chain.launch_supervised(  # noqa: E731
        f"runs/{run_name}", snap, args, f"chain_{run_name}.log")
    chain.wait_relay_up()
    launch()
    time.sleep(120)
    chain.wait_run_complete(REPO / "runs" / run_name, epochs, launch)
    promoted = chain.promote(REPO / "runs" / run_name, arch, imgsz, asset,
                             results_key, note)
    chain.commit(f"{arch} no-mosaic polish: full-val eval "
                 f"({'promoted' if promoted else 'kept prior best'})")
    return promoted


def main() -> None:
    # Same platform-override scrub as the r3b chain: every chip stage here
    # (supervised training, full evals, bench) must see the real TPU.
    import os
    chain.ensure_tpu_env()

    while r3b_chain_alive():
        print("r3b chain still running; waiting...", flush=True)
        time.sleep(180)
    chain.wait_for_training_idle()

    v8n_promoted = polish(
        "", V8N_NOTE, "v8n_640_polish", "v8n_640_polish_best",
        V8N_ARGS, "yolov8n-seg", 640, "v8n_640_best.msgpack", 30)
    y11n_promoted = polish(
        "second_arch", Y11N_NOTE, "y11n_256_polish", "y11n_256_polish_best",
        Y11N_ARGS, "yolo11n-seg", 256, "y11n_256_best.msgpack", 60)

    chain.regen_artifacts(v8n_promoted, y11n_promoted)
    if v8n_promoted or y11n_promoted:
        chain.run_bench()
    chain.commit("Polish-chain artifacts (stage-5 fine-tune endgame)")


if __name__ == "__main__":
    main()
