#!/usr/bin/env python
"""arch x imgsz study chain (VERDICT r3 #8).

The reference trained 9 runs sweeping architecture and image size
(model/runs/segment/train*/args.yaml: v8n/y11n/y11m at imgsz 192-640).
This chain reproduces the *study* shape with short-budget from-scratch
runs — v8n at imgsz {256, 320, 480} — writing a results.csv twin + curves
per run into assets/ and a "study" section in TRAINING_RESULTS.json, so
the training subsystem demonstrably reproduces the sweep methodology, not
just the two headline recipes.

Runs strictly AFTER the r3b and polish chains (exact-argv interlock): the
study must never steal chip time from the model-quality endgame.
Idempotent via study notes in TRAINING_RESULTS.json.
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

# (imgsz, batch, epochs, close_mosaic_last). Budgets mirror the reference's
# short exploratory rows (train10/train15 are 10-epoch probes; these get 40
# epochs so the curves show a real learning trajectory at each scale).
STUDY = [(256, 64, 40, 10), (320, 48, 40, 10), (480, 24, 40, 10)]


def other_chain_alive() -> bool:
    return chain.chains_alive("round3b_chain.py", "levers_chain.py",
                              "polish_chain.py")


def study_rows() -> list[dict]:
    result = json.loads(chain.RESULTS.read_text())
    return result.get("study", [])


def record_row(row: dict) -> None:
    result = json.loads(chain.RESULTS.read_text())
    rows = [r for r in result.get("study", [])
            if r.get("run") != row.get("run")]
    result["study"] = rows + [row]
    chain.RESULTS.write_text(json.dumps(result, indent=1))


def run_study(imgsz: int, batch: int, epochs: int, close_last: int) -> None:
    run = f"v8n_{imgsz}_study"
    if any(r.get("run") == run and r.get("full_val") for r in study_rows()):
        print(f"{run}: already recorded; skipping", flush=True)
        return
    args = ["--imgsz", str(imgsz), "--batch", str(batch),
            "--epochs", str(epochs), "--close-mosaic", str(close_last),
            "--eval-every", "10", "--eval-images", "256",
            "--max-rss-gb", "100", "--wire-format", "i420"]
    launch = lambda: chain.launch_supervised(  # noqa: E731
        f"runs/{run}", f"{run}_best", args, f"chain_{run}.log")
    chain.wait_relay_up()
    launch()
    time.sleep(120)
    chain.wait_run_complete(REPO / "runs" / run, epochs, launch)

    best = REPO / "runs" / run / "best.msgpack"
    if not best.exists():
        # A run that died before its first eval checkpoint must not kill
        # the remaining study rows; record the failure and move on.
        record_row({"run": run, "arch": "yolov8n-seg", "imgsz": imgsz,
                    "epochs": epochs, "batch": batch,
                    "error": "run produced no best.msgpack "
                             "(died before the first eval checkpoint)"})
        print(f"{run}: no best.msgpack; recorded failure row", flush=True)
        return
    m = chain.full_eval("yolov8n-seg", imgsz, best)
    cpu = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}
    hist = REPO / "runs" / run / "history.json"
    if hist.exists():
        chain.sh(sys.executable, "tools/plot_training.py", str(hist),
                 "-o", f"assets/{run}_training_curves.png",
                 "--csv", f"assets/{run}_results.csv",
                 check=False, env=cpu)
    record_row({
        "run": run, "arch": "yolov8n-seg", "imgsz": imgsz,
        "epochs": epochs, "batch": batch, "full_val": m,
        "note": f"arch x imgsz study row: from-scratch short-budget run "
                f"mirroring the reference's train*/args.yaml sweep "
                f"(results twin: assets/{run}_results.csv)",
    })
    chain.commit(f"Study row v8n@{imgsz}: {epochs}-epoch from-scratch run, "
                 f"full-val mask mAP50 {m.get('map50_mask', 0):.4f}")


def main() -> None:
    chain.ensure_tpu_env()

    while other_chain_alive():
        print("r3b/polish chain still running; waiting...", flush=True)
        time.sleep(300)
    chain.wait_for_training_idle()

    for imgsz, batch, epochs, close_last in STUDY:
        run_study(imgsz, batch, epochs, close_last)
    chain.commit("arch x imgsz study complete (3 short-budget rows)")


if __name__ == "__main__":
    main()
