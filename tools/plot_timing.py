#!/usr/bin/env python
"""Per-stage timing box plots — twin of the reference's
images/profiling_21_02/plot.py (SURVEY.md §2.5/§5), which renders the
timing_data.txt artifacts from profiling runs into matplotlib box plots for
before/after comparison.

Inputs (one or more, each becomes a labelled group on the x-axis):
  * a samples JSON written by StageTimer.write_samples()
    (tools/profile_pipeline.py --samples-path) — full distributions; or
  * a timing_data.txt aggregate (Avg/Last/Min/Max per stage) — degraded view
    (whiskers from min/max, box collapsed to the average), accepted so the
    reference's own archived artifacts plot side-by-side with ours.

Usage:
  python tools/plot_timing.py run1_samples.json run2_samples.json -o plot.png
  python tools/plot_timing.py timing_data.txt -o plot.png
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys


def load_run(path: pathlib.Path) -> dict[str, list[float]]:
    text = path.read_text()
    if path.suffix == ".json":
        return {k: list(map(float, v)) for k, v in json.loads(text).items()}
    # timing_data.txt: "stage:\n  Avg: x\n  Last: x\n  Min: x\n  Max: x"
    runs: dict[str, list[float]] = {}
    stage = None
    stats: dict[str, float] = {}

    def flush():
        if stage and stats:
            # Degenerate 5-number summary: [min, avg, avg, avg, max]. Our
            # profiler writes "Avg:"; the reference's archived artifacts
            # write "Average:" — accept both.
            avg = stats.get("avg", stats.get("average", 0.0))
            runs[stage] = [stats.get("min", 0.0), avg, avg, avg,
                           stats.get("max", 0.0)]

    for line in text.splitlines():
        if not line.strip():
            continue
        if not line.startswith(" ") and line.rstrip().endswith(":"):
            flush()
            stage, stats = line.strip().rstrip(":"), {}
        elif ":" in line:
            k, v = line.strip().split(":", 1)
            try:
                stats[k.strip().lower()] = float(v)
            except ValueError:
                pass
    flush()
    return runs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="samples .json / timing_data.txt")
    ap.add_argument("-o", "--output", default="timing_boxplot.png")
    ap.add_argument("--unit", choices=["s", "ms"], default="ms")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    datasets = [(pathlib.Path(p).stem, load_run(pathlib.Path(p)))
                for p in args.runs]
    stages = []
    for _, run in datasets:
        for s in run:
            if s not in stages:
                stages.append(s)

    scale = 1000.0 if args.unit == "ms" else 1.0
    fig, axes = plt.subplots(1, len(stages),
                             figsize=(2.2 * len(stages) + 1, 4), sharey=False)
    if len(stages) == 1:
        axes = [axes]
    for ax, stage in zip(axes, stages):
        data = [[x * scale for x in run.get(stage, [])]
                for _, run in datasets]
        labels = [name for name, _ in datasets]
        # whis=(0, 100): whiskers span the full min..max. This keeps the
        # degenerate 5-number summaries from timing_data.txt meaningful (their
        # IQR is zero, so default whiskers would collapse to the average) and
        # shows the full spread for real sample sets. A stage absent from a
        # run plots as an empty slot (NaN), never as a fabricated zero.
        ax.boxplot([d if d else [float("nan")] for d in data],
                   tick_labels=labels, showfliers=False, whis=(0, 100))
        ax.set_title(stage, fontsize=8)
        ax.tick_params(axis="x", labelrotation=45, labelsize=7)
        ax.tick_params(axis="y", labelsize=7)
    axes[0].set_ylabel(f"time ({args.unit}/frame)")
    fig.suptitle("per-stage frame time")
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
