#!/usr/bin/env python
"""Round-4 recipe-lever run (VERDICT r3 #2): new augmentation levers aimed
at the from-scratch mAP gap.

Waits for the r3b chain (v8n r2 finish + faithful y11n), then runs the
proven restart pattern on v8n@640 — init from the promoted best, full LR
re-warm, full cosine — with the two new levers enabled:
  * instance copy-paste (p=0.3, data/augment.copy_paste),
  * rotation/shear/perspective jitter (5 deg / 2 deg / 5e-4 — body-worn
    camera tilt prior; data/augment.random_affine full projective path).
Promotion only on full-val improvement, so the downside is bounded at zero;
either way the curves + results twin land in assets/ and the outcome is
recorded in TRAINING_RESULTS.json (a documented negative is still a tried
lever).

Interlock: runs after round3b_chain.py; polish_chain.py and study_chain.py
wait for this script in turn. Idempotent via the TRAINING_RESULTS note.
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

# Two attributable stages, each promote-on-improvement:
#   A: extra data (train+test) + mild geometry jitter — the low-risk pair.
#   B: instance copy-paste on top — the speculative lever, isolated so a
#      regression cannot mask stage A's gain.
STAGES = [
    # Budgets trimmed 120/60 -> 70/30 for round 5: the relay returned with
    # ~11 h of round left and the full family (y11n 300ep + levers + study)
    # must all land; a complete 70-epoch cosine beats a truncated 120.
    ("v8n_640_levers", 70,
     "recipe levers A: train+test extra data (530 labelled frames) + "
     "rotation/shear/perspective (5deg/2deg/5e-4), 70-epoch restart from "
     "the promoted best",
     ["--epochs", "70", "--eval-every", "10", "--eval-images", "256",
      "--max-rss-gb", "100", "--wire-format", "i420",
      "--degrees", "5.0", "--shear", "2.0", "--perspective", "0.0005",
      "--train-split", "train+test",
      "--resume", "assets/weights/v8n_640_best.msgpack"]),
    ("v8n_640_leversB", 30,
     "recipe levers B: + instance copy-paste 0.3, 30-epoch restart from "
     "the stage-A promoted best",
     ["--epochs", "30", "--eval-every", "10", "--eval-images", "256",
      "--max-rss-gb", "100", "--wire-format", "i420",
      "--degrees", "5.0", "--shear", "2.0", "--perspective", "0.0005",
      "--train-split", "train+test", "--copy-paste", "0.3",
      "--resume", "assets/weights/v8n_640_best.msgpack"]),
]


def r3b_alive() -> bool:
    return chain.chains_alive("round3b_chain.py")


def stage_done(note: str) -> bool:
    result = json.loads(chain.RESULTS.read_text())
    prefix = note.split(":")[0]
    return any(r.get("note", "").startswith(prefix)
               for r in result.get("restart_runs", []))


def run_stage(run: str, epochs: int, note: str, args: list[str]) -> bool:
    if stage_done(note):
        print(f"{run}: already recorded; skipping", flush=True)
        return False
    launch = lambda: chain.launch_supervised(  # noqa: E731
        f"runs/{run}", f"{run}_best", args, f"chain_{run}.log")
    chain.wait_relay_up()
    launch()
    time.sleep(120)
    chain.wait_run_complete(REPO / "runs" / run, epochs, launch)
    promoted = chain.promote(REPO / "runs" / run, "yolov8n-seg", 640,
                             "v8n_640_best.msgpack", "", note)
    cpu = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}
    hist = REPO / "runs" / run / "history.json"
    if hist.exists():
        chain.sh(sys.executable, "tools/plot_training.py", str(hist),
                 "-o", f"assets/{run}_training_curves.png",
                 "--csv", f"assets/{run}_results.csv", check=False, env=cpu)
    chain.commit(f"Recipe-lever stage {run}: "
                 f"{'promoted' if promoted else 'kept prior best'}")
    return promoted


def main() -> None:
    chain.ensure_tpu_env()

    while r3b_alive():
        print("r3b chain still running; waiting...", flush=True)
        time.sleep(180)
    chain.wait_for_training_idle()

    any_promoted = False
    for run, epochs, note, args in STAGES:
        any_promoted |= run_stage(run, epochs, note, args)
    if any_promoted:
        chain.regen_artifacts(True, False)
        chain.run_bench()
        chain.commit("Recipe-lever artifacts (goldens/demo/bench regen)")


if __name__ == "__main__":
    main()
