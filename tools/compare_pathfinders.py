#!/usr/bin/env python
"""A/B pathfinder harness: exact (numpy / native C++) vs on-chip wavefront.

Twin of the reference's optimise_path_finder harnesses
(utilities/optimise_path_finder{,_attempt2}/main.py): run every scenario
through each engine, render penalty-field + path overlays to PNGs, and print
a timing/agreement table.

Usage: python tools/compare_pathfinders.py [--out results/pathfinder_ab]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def render(gold, paths_by_engine: dict[str, list], out_path: pathlib.Path):
    from vision_assist_tpu.io.visualiser import penalty_colour

    g = 20
    rows, cols = gold.walkable.shape
    img = np.zeros((rows * g, cols * g, 3), np.uint8)
    for r, c in zip(*np.nonzero(gold.walkable)):
        img[r * g:(r + 1) * g, c * g:(c + 1) * g] = penalty_colour(
            float(gold.penalty[r, c]))
    colours = {"exact": (255, 255, 255), "native": (255, 255, 0),
               "wavefront": (255, 0, 255)}
    for engine, path in paths_by_engine.items():
        col = colours.get(engine, (0, 255, 255))
        for i, (r, c) in enumerate(path):
            pad = 6 if engine == "exact" else 8 if engine == "native" else 2
            img[r * g + pad:(r + 1) * g - pad,
                c * g + pad:(c + 1) * g - pad] = col
    try:
        import cv2

        cv2.imwrite(str(out_path), img)
    except ImportError:
        np.save(out_path.with_suffix(".npy"), img)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/pathfinder_ab")
    args = ap.parse_args()
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    import jax.numpy as jnp

    from vision_assist_tpu.golden.astar import AStarEngine, closest_cell_to_point
    from vision_assist_tpu.golden.pipeline import GoldenReplayPipeline
    from vision_assist_tpu.io.scenarios import load_scenario, scenario_names
    from vision_assist_tpu.planning import native
    from vision_assist_tpu.planning.wavefront import (
        closest_walkable_cell,
        find_paths,
    )

    rows = []
    print(f"{'scenario':32s} {'exact(ms)':>10s} {'native(ms)':>11s} "
          f"{'wave(ms)':>9s} {'nat=ex':>7s} {'wave=ex':>8s}")
    for name in scenario_names():
        occ = load_scenario(name)
        gold = GoldenReplayPipeline().process(occ)
        start = gold.start_cell
        if not gold.peaks or start is None:
            # Degenerate fixture (no walkable cells / no peaks) — the
            # editor lets users drop those in; skip instead of aborting
            # the whole A/B run.
            print(f"{name:32s} {'(no peaks/start — skipped)':>48s}")
            continue
        goal = closest_cell_to_point(gold.walkable,
                                     gold.peaks[0].centre.to_tuple())

        eng = AStarEngine()
        t0 = time.perf_counter()
        p_exact, _ = eng.find_path(gold.walkable, gold.penalty, start, goal)
        t_exact = (time.perf_counter() - t0) * 1000

        p_native, t_native = None, float("nan")
        if native.available():
            nat = native.NativeAStarEngine()
            t0 = time.perf_counter()
            p_native, _ = nat.find_path(gold.walkable, gold.penalty, start, goal)
            t_native = (time.perf_counter() - t0) * 1000

        walk = jnp.asarray(gold.walkable)
        pen = jnp.asarray(gold.penalty, jnp.float32)
        goals = jnp.asarray(np.tile(np.asarray(goal, np.int32), (8, 1)))
        gvalid = jnp.asarray([True] + [False] * 7)
        # Same start cell as the exact engines (gold.start_cell), not a
        # recomputation from hardcoded 720x1280 pixel coords — arbitrary
        # scenario shapes would otherwise report spurious disagreement.
        srt = jnp.asarray(start, jnp.int32)
        find_paths(walk, pen, srt, goals, gvalid)  # compile
        t0 = time.perf_counter()
        pb = find_paths(walk, pen, srt, goals, gvalid)
        pb.cells.block_until_ready()
        t_wave = (time.perf_counter() - t0) * 1000
        p_wave = [tuple(x) for x in np.asarray(
            pb.cells[0][:int(pb.lengths[0])])]

        same_nat = p_native == p_exact if p_native is not None else None
        same_wave = p_wave == p_exact
        print(f"{name:32s} {t_exact:10.1f} {t_native:11.2f} {t_wave:9.1f} "
              f"{str(same_nat):>7s} {str(same_wave):>8s}")
        paths = {"exact": p_exact, "wavefront": p_wave}
        if p_native is not None:
            paths["native"] = p_native
        render(gold, paths, out / f"{name}.png")
        rows.append((name, t_exact, t_native, t_wave, same_nat, same_wave))

    # native-unavailable (None) rows are excluded from the denominator —
    # "0/13" on a host without a compiler is not disagreement.
    nat_rows = [r for r in rows if r[4] is not None]
    n_wave = sum(1 for r in rows if r[5])
    if nat_rows:
        print(f"\nnative path == exact: "
              f"{sum(1 for r in nat_rows if r[4])}/{len(nat_rows)}; "
              f"wavefront path == exact: {n_wave}/{len(rows)}")
    else:
        print(f"\nnative engine unavailable (no C++ toolchain); "
              f"wavefront path == exact: {n_wave}/{len(rows)}")
    print(f"renders in {out}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
