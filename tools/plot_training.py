#!/usr/bin/env python
"""Render training curves from a run's history.json.

Counterpart of ultralytics' results.png / results.csv plots (the reference's
training artifacts under model/runs/segment/train*/): loss components and
eval mAP over epochs, one PNG.

Usage:
  python tools/plot_training.py runs/v8n_640/history.json [-o training_curves.png]
  python tools/plot_training.py runs/v8n_640/history.json --csv results.csv
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

LOSS_KEYS = ("box", "seg", "cls", "dfl")
MAP_KEYS = ("map50_box", "map50_95_box", "map50_mask", "map50_95_mask")


def write_csv(history: list[dict], path: pathlib.Path) -> None:
    """results.csv-style dump (one row per epoch, blank cells for no-eval)."""
    cols = ["epoch", *LOSS_KEYS, "loss", "time_s", *MAP_KEYS]
    rows = [",".join(cols)]
    for e in history:
        rows.append(",".join(
            f"{e[c]:.6g}" if c in e else "" for c in cols))
    path.write_text("\n".join(rows) + "\n")


def plot(history: list[dict], out: pathlib.Path) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    epochs = [e["epoch"] for e in history]
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))

    for k in LOSS_KEYS:
        axes[0].plot(epochs, [e.get(k) for e in history], label=k)
    axes[0].set_xlabel("epoch")
    axes[0].set_ylabel("loss component")
    axes[0].set_title("training loss")
    axes[0].legend()
    axes[0].grid(alpha=0.3)

    evals = [e for e in history if "map50_mask" in e]
    if evals:
        ee = [e["epoch"] for e in evals]
        for k in MAP_KEYS:
            axes[1].plot(ee, [e.get(k) for e in evals], marker="o", label=k)
        axes[1].set_ylim(0, 1)
    axes[1].set_xlabel("epoch")
    axes[1].set_ylabel("mAP")
    axes[1].set_title("validation mAP (subset evals during training)")
    axes[1].legend()
    axes[1].grid(alpha=0.3)

    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("history", help="path to a run's history.json")
    ap.add_argument("-o", "--out", default=None,
                    help="output PNG (default: <run dir>/training_curves.png)")
    ap.add_argument("--csv", default=None,
                    help="also write a results.csv-style table here")
    args = ap.parse_args()

    hp = pathlib.Path(args.history)
    history = json.loads(hp.read_text())
    if not history:
        print("empty history", file=sys.stderr)
        return 1
    out = pathlib.Path(args.out) if args.out else \
        hp.parent / "training_curves.png"
    plot(history, out)
    if args.csv:
        write_csv(history, pathlib.Path(args.csv))
        print(f"wrote {args.csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
