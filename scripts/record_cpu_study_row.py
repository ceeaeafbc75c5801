#!/usr/bin/env python
"""Record the relay-outage CPU study row into TRAINING_RESULTS.json.

The chip study chain (scripts/study_chain.py) records its rows with a
full chip eval; this records the round-5 contingency row (VERDICT r4
item 8: CPU-feasible short runs while the relay is down) from the run's
own history.json — the trainer's final epoch already ran the FULL valid
split, so no separate eval pass is needed. The row carries an explicit
``device: cpu`` stamp so it can never be mistaken for a chip row, and
the same results.csv twin + curves the chip rows get
(reference sweep being mirrored: model/runs/segment/train*/args.yaml).
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
RESULTS = REPO / "TRAINING_RESULTS.json"


def main() -> int:
    run = sys.argv[1] if len(sys.argv) > 1 else "v8n_192_cpu_study"
    run_dir = REPO / "runs" / run
    hist_path = run_dir / "history.json"
    if not hist_path.exists():
        print(f"{hist_path} missing — run incomplete; nothing recorded")
        return 1
    history = json.loads(hist_path.read_text())
    evals = [h for h in history if "map50_mask" in h]
    if not evals:
        print("no eval epoch in history — nothing recorded")
        return 1
    final = evals[-1]
    args = json.loads((run_dir / "args.json").read_text())

    csv = REPO / "assets" / f"{run}_results.csv"
    png = REPO / "assets" / f"{run}_training_curves.png"
    subprocess.run(
        [sys.executable, str(REPO / "tools/plot_training.py"),
         str(hist_path), "-o", str(png), "--csv", str(csv)],
        check=False)

    full_val = {k: final[k] for k in
                ("map50_mask", "map50_95_mask", "map50_box")
                if k in final}
    # The trainer evals the FULL valid split only on the final epoch;
    # mid-run evals use --eval-images. Label the row honestly so a
    # provisional (run-interrupted) row can't masquerade as full-val.
    is_final = final.get("epoch") == int(args.get("epochs", 0))
    split = ("valid (full split, final-epoch eval)" if is_final else
             f"valid (subset of {args.get('eval_images')} images — "
             f"run interrupted at epoch {final.get('epoch')}; PROVISIONAL)")
    row = {
        "run": run,
        "arch": args.get("arch", "yolov8n-seg"),
        "imgsz": int(args.get("imgsz", 192)),
        "epochs": len([h for h in history if not h.get("reverted")]),
        "batch": int(args.get("batch", 32)),
        "device": "cpu",
        ("full_val" if is_final else "subset_val"): full_val,
        "final_eval_split": split,
        "note": ("relay-outage contingency study row (VERDICT r4 #8): "
                 "short-budget from-scratch run executed on the CPU "
                 "backend while the TPU relay was down; demonstrates the "
                 "arch x imgsz sweep methodology "
                 f"(results twin: assets/{run}_results.csv). NOT "
                 "comparable to chip rows on wall-clock; mAP is "
                 "backend-independent (f32)."),
    }
    result = json.loads(RESULTS.read_text())
    rows = [r for r in result.get("study", []) if r.get("run") != run]
    result["study"] = rows + [row]
    RESULTS.write_text(json.dumps(result, indent=1))
    print(json.dumps(row, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
