#!/usr/bin/env python
"""Checkpoint-soup sweep + promote-on-improvement for the v8n flagship.

Round-4 precedent: a uniform parameter average of two same-lineage EMA
checkpoints beat both parents (0.6313 vs 0.6230 mask mAP50 full-val,
diagnostics/cpu_eval_v8n_soups.json). This script makes that endgame step
repeatable: given the currently promoted flagship plus any newer same-arch
run checkpoints (lever stages, polish), it sweeps blend ratios, full-evals
each candidate on the live backend, and promotes the winner into
assets/weights/v8n_640_best.msgpack with an honest TRAINING_RESULTS.json
record (promotion only on strict full-val improvement).

Souping is only sound within one fine-tuning lineage (all candidates here
descend from the same from-scratch v8n run — lever/polish stages resume
from the promoted best), which is exactly the "model soups" recipe for
averaging fine-tunes of a shared init.

Usage:
  python scripts/soup_sweep.py runs/v8n_640_levers/best.msgpack \
      [runs/v8n_640_leversB/best.msgpack ...] [--alphas 0.3,0.5,0.7]

The baseline parent is always assets/weights/v8n_640_best.msgpack; each
extra argument is blended pairwise against it at every alpha
(soup = alpha*base + (1-alpha)*candidate), plus the uniform average of ALL
parents when more than one candidate is given.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import shutil
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BASE = REPO / "assets/weights/v8n_640_best.msgpack"
RESULTS = REPO / "TRAINING_RESULTS.json"


def blend(trees: list, weights: list[float]):
    import jax

    assert abs(sum(weights) - 1.0) < 1e-6
    return jax.tree_util.tree_map(
        lambda *leaves: sum(w * l for w, l in zip(weights, leaves)), *trees)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("candidates", nargs="+", type=pathlib.Path)
    ap.add_argument("--alphas", default="0.3,0.5,0.7",
                    help="base weights for pairwise blends")
    ap.add_argument("--eval-batch", type=int, default=16)
    args = ap.parse_args()

    from vision_assist_tpu.models.checkpoint import (load_variables,
                                                     save_variables)
    from vision_assist_tpu.models.evaluate import evaluate
    from vision_assist_tpu.models.yolo import YoloSeg
    from vision_assist_tpu.utils.cache import enable as enable_cache
    enable_cache()

    import jax
    device = jax.devices()[0]
    model = YoloSeg(arch="yolov8n-seg", num_classes=1)

    def full_eval(variables) -> dict:
        return evaluate(model, variables, "/root/reference/model", "valid",
                        imgsz=640, batch_size=args.eval_batch, verbose=True)

    base = load_variables(BASE)
    cands = [(p, load_variables(p)) for p in args.candidates if p.exists()]
    if not cands:
        print("no candidate checkpoints exist; nothing to soup")
        return

    alphas = [float(a) for a in args.alphas.split(",")]
    sweep: list[tuple[str, object]] = []
    for p, v in cands:
        for a in alphas:
            sweep.append((f"{a:.2f}*base + {1 - a:.2f}*{p}", blend(
                [base, v], [a, 1.0 - a])))
        sweep.append((f"candidate {p} alone", v))
    if len(cands) > 1:
        n = len(cands) + 1
        sweep.append(("uniform average of base + all candidates", blend(
            [base] + [v for _, v in cands], [1.0 / n] * n)))

    results = json.loads(RESULTS.read_text())
    prev = results["full_val"]["map50_mask"]
    rows = []
    best_name, best_vars, best_m = "committed base", None, {
        "map50_mask": prev}
    for name, v in sweep:
        m = full_eval(v)
        print(f"SOUP {name}: {json.dumps(m)}", flush=True)
        rows.append({"blend": name, **m})
        if m["map50_mask"] > best_m["map50_mask"]:
            best_name, best_vars, best_m = name, v, m

    out = {"rows": rows, "baseline_map50_mask": prev,
           "device": str(device), "platform": device.platform,
           "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                        time.gmtime())}
    diag = REPO / "diagnostics/soup_sweep.json"
    diag.write_text(json.dumps(out, indent=1))
    print(f"wrote {diag}")

    if best_vars is None:
        print(f"no blend beat the committed base ({prev:.4f}); "
              "tree untouched")
        record = {"note": "soup sweep (round 5): no blend beat the "
                          f"committed base ({prev:.4f}); kept prior best",
                  "full_val": {r["blend"]: {"map50_mask": r["map50_mask"]}
                               for r in rows}}
        results.setdefault("restart_runs", []).append(record)
        RESULTS.write_text(json.dumps(results, indent=1))
        return

    backup = BASE.with_suffix(".presoup.msgpack")
    shutil.copy(BASE, backup)
    save_variables(BASE, best_vars)
    results["full_val"] = dict(best_m)
    results.setdefault("restart_runs", []).append({
        "note": f"soup sweep (round 5): promoted '{best_name}' "
                f"({best_m['map50_mask']:.4f} > {prev:.4f}); full sweep in "
                "diagnostics/soup_sweep.json",
        "full_val": {best_name: best_m},
        "promoted": True,
        "previous_full_val": {"map50_mask": prev},
    })
    RESULTS.write_text(json.dumps(results, indent=1))
    print(f"PROMOTED soup '{best_name}' ({best_m['map50_mask']:.4f} > "
          f"{prev:.4f}); previous asset kept at {backup}")


if __name__ == "__main__":
    main()
