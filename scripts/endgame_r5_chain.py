#!/usr/bin/env python
"""Round-5 endgame chain: flagship quality first, study rows second.

Replaces the remaining levers/study agenda after a mid-round budget check:
the planned v8n@640 levers stage measured ~4.5-7 min/epoch live (70-epoch
cosine = 5+ h), which cannot complete in the round's remaining chip time.
Epochs at 256 are ~10x cheaper, and the deployed flagship (yolo11n-seg@256,
0.7815 mask mAP50 full-val) sits 0.0288 below the reference's own
arch+imgsz-matched row (train16, 0.8103) — so the remaining chip budget
goes to the flagship, where a promotion moves the headline number.

Stages (each promote-on-improvement, downside bounded at zero):
  1. y11n@256 extra-data lever: +530 labelled frames (train+test split,
     valid stays eval-only; the promotion carries the protocol caveat),
     full cosine restart from the promoted 300-epoch best.
  2. arch x imgsz study rows (study_chain.run_study), largest-first ONLY
     while the clock allows: a row is launched only if its estimated
     duration fits before BANK_AT (the end-of-round banking window).
  3. If time remains: y11n@256 geometry-jitter lever on top of whatever
     stage 1 left promoted (the second half of the levers pair, isolated
     so a regression cannot mask stage 1's gain).

Interlock: assumes the v8n levers family was explicitly cancelled (the
cancellation row is recorded in TRAINING_RESULTS.json restart_runs).
Idempotent via TRAINING_RESULTS notes, like every other chain.
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
import study_chain  # noqa: E402  (run_study row helper)

# Launch no new chip stage that would still be running at this UTC time;
# the banking window (quiet-chip bench + diagnostics bundle) needs the
# chip back. Override: ENDGAME_BANK_AT=HH:MM (UTC, today).
BANK_AT = os.environ.get("ENDGAME_BANK_AT", "14:15")

Y11N_LEVER_ARGS = [
    "--arch", "yolo11n-seg", "--imgsz", "256", "--batch", "64",
    "--epochs", "180", "--eval-every", "20", "--eval-images", "256",
    "--max-rss-gb", "100", "--wire-format", "i420",
    "--train-split", "train+test",
    "--resume", "assets/weights/y11n_256_r2_best.msgpack",
]
Y11N_JITTER_ARGS = [
    "--arch", "yolo11n-seg", "--imgsz", "256", "--batch", "64",
    "--epochs", "100", "--eval-every", "20", "--eval-images", "256",
    "--max-rss-gb", "100", "--wire-format", "i420",
    "--train-split", "train+test",
    "--degrees", "5.0", "--shear", "2.0", "--perspective", "0.0005",
    "--resume", "assets/weights/y11n_256_r2_best.msgpack",
]


def seconds_until_bank() -> float:
    hh, mm = (int(x) for x in BANK_AT.split(":"))
    now = time.time()
    lt = time.gmtime(now)
    bank = time.mktime((lt.tm_year, lt.tm_mon, lt.tm_mday, hh, mm, 0,
                        0, 0, 0)) - time.timezone
    return bank - now


def note_recorded(prefix: str, key: str = "second_arch") -> bool:
    result = json.loads(chain.RESULTS.read_text())
    section = result if key == "" else result.get(key, {})
    return any(r.get("note", "").startswith(prefix)
               for r in section.get("restart_runs", []))


def run_y11n_stage(run: str, epochs: int, note: str, args: list[str]) -> bool:
    if note_recorded(note.split(":")[0]):
        print(f"{run}: already recorded; skipping", flush=True)
        return False
    launch = lambda: chain.launch_supervised(  # noqa: E731
        f"runs/{run}", f"{run}_best", args, f"chain_{run}.log")
    chain.wait_relay_up()
    launch()
    time.sleep(120)
    chain.wait_run_complete(REPO / "runs" / run, epochs, launch)
    promoted = chain.promote(REPO / "runs" / run, "yolo11n-seg", 256,
                             "y11n_256_r2_best.msgpack", "second_arch", note)
    if promoted:
        # The deployed-model record follows the promoted checkpoint; the
        # serving-detection count is re-measured by the banking bundle
        # (diagnose_detections serves the flagship record by default).
        from vision_assist_tpu.models import flagship as flagship_mod
        sec = json.loads(chain.RESULTS.read_text())["second_arch"]
        fv = sec["full_val"]
        flagship_mod.write_flagship(
            "y11n_256_r2_best.msgpack", "yolo11n-seg", 256,
            map50_mask=round(fv["map50_mask"], 4),
            map50_95_mask=round(fv["map50_95_mask"], 4),
            train_split=fv.get("train_split", "train"),
            epochs=sec.get("epochs_completed"),
            provenance=note,
        )
    cpu = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}
    hist = REPO / "runs" / run / "history.json"
    if hist.exists():
        chain.sh(sys.executable, "tools/plot_training.py", str(hist),
                 "-o", f"assets/{run}_training_curves.png",
                 "--csv", f"assets/{run}_results.csv", check=False, env=cpu)
    chain.commit(f"Flagship lever stage {run}: "
                 f"{'PROMOTED' if promoted else 'kept prior best'}")
    return promoted


def main() -> None:
    chain.ensure_tpu_env()
    chain.wait_for_training_idle()

    # Stage 1: extra-data lever on the flagship (est ~30 s/epoch at 256
    # with the larger split -> ~1.5 h + two full evals).
    if seconds_until_bank() > 2.4 * 3600:
        run_y11n_stage(
            "y11n_256_levers", 180,
            "recipe lever on the flagship (extra data): train+test split "
            "(+530 labelled frames, valid stays eval-only), 180-epoch "
            "cosine restart from the promoted 300-epoch best",
            Y11N_LEVER_ARGS)
    else:
        print("stage 1 skipped: not enough time before banking", flush=True)

    # Stage 2: study rows, cheapest-first; launch only what fits.
    # (imgsz, batch, epochs, close_mosaic_last, est_seconds)
    for imgsz, batch, epochs, close, est_s in (
            (256, 64, 40, 10, 2700), (320, 48, 40, 10, 3900),
            (480, 24, 40, 10, 6600)):
        chain.wait_for_training_idle()
        left = seconds_until_bank()
        if left < est_s:
            print(f"study row v8n@{imgsz} skipped: est {est_s}s > "
                  f"{int(left)}s before banking", flush=True)
            continue
        study_chain.run_study(imgsz, batch, epochs, close)

    # Stage 3: geometry-jitter lever, only with comfortable headroom.
    chain.wait_for_training_idle()
    if seconds_until_bank() > 1.6 * 3600:
        run_y11n_stage(
            "y11n_256_jitter", 100,
            "recipe lever on the flagship (geometry): + rotation/shear/"
            "perspective (5deg/2deg/5e-4) over the stage-1 recipe, "
            "100-epoch cosine restart from the current promoted best",
            Y11N_JITTER_ARGS)

    chain.commit("Endgame chain complete (flagship levers + study rows)")
    print("endgame chain done", flush=True)


if __name__ == "__main__":
    main()
