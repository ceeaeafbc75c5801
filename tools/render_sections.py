#!/usr/bin/env python
"""Path sectioning visual test rig — twin of the reference's
testing/path_model/test.py: construct analysed paths from the scenario
fixtures, time sectioning/corner detection, and render section/corner
overlays to PNGs for eyeball comparison.

Usage: python tools/render_sections.py [--out results/sections]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/sections")
    args = ap.parse_args()
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    from vision_assist_tpu.config import replay_config
    from vision_assist_tpu.golden.pipeline import GoldenReplayPipeline
    from vision_assist_tpu.io.scenarios import load_scenario, scenario_names
    from vision_assist_tpu.io.visualiser import render_overlay
    from vision_assist_tpu.semantics.sections import build_path

    cfg = replay_config()
    for name in scenario_names():
        gold = GoldenReplayPipeline().process(load_scenario(name))
        for i, path in enumerate(gold.paths):
            t0 = time.perf_counter()
            rebuilt = build_path([c for c in path.cells], path.total_cost)
            dt = (time.perf_counter() - t0) * 1000
            kinds = [s.path_type.replace("section-", "") for s in rebuilt.sections]
            corners = [(c.direction, c.sharpness, c.shape)
                       for c in rebuilt.corners]
            print(f"{name}[{i}]: {len(path.cells)} cells -> "
                  f"{len(rebuilt.sections)} sections {kinds} "
                  f"corners={corners} [{dt:.2f} ms]")
        res = type("R", (), dict(
            walkable=gold.walkable, penalty=gold.penalty,
            paths=gold.paths, peaks=gold.peaks))()
        img = render_overlay(cfg, res)
        try:
            import cv2

            cv2.imwrite(str(out / f"{name}_sections.png"), img)
        except ImportError:
            np.save(out / f"{name}_sections.npy", img)
    print(f"renders in {out}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
