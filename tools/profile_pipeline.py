#!/usr/bin/env python
"""Per-stage profiling harness — twin of the reference's
main_with_time_saving.py / FrameProcessor_with_time_saving.py (SURVEY.md §5):
brackets each pipeline stage, drops outlier frames, and writes the same
timing_data.txt format (stage names match the reference's so the box-plot
tooling and BASELINE.md rows are directly comparable).

Usage:
  python tools/profile_pipeline.py --frames 50 [--scenario right_turn]
      [--with-model] [--timing-data-path timing_data.txt]
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
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--scenario", default="right_turn")
    ap.add_argument("--with-model", action="store_true",
                    help="include the YOLO forward (random weights)")
    ap.add_argument("--engine", choices=["wavefront", "exact"],
                    default="wavefront",
                    help="path_finding stage implementation; exact_device's "
                         "serving latency is measured end-to-end by "
                         "tools/diagnose_engines.py")
    ap.add_argument("--timing-data-path", default="timing_data.txt")
    ap.add_argument("--samples-path", default=None,
                    help="also dump raw per-frame samples as JSON "
                         "(input for tools/plot_timing.py box plots)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vision_assist_tpu.config import ModelConfig, replay_config
    from vision_assist_tpu.io.scenarios import load_scenario
    from vision_assist_tpu.ops.lattice import inject_artificial_cells, rasterize_cells
    from vision_assist_tpu.ops.peaks import find_peaks
    from vision_assist_tpu.ops.penalty import penalty_field
    from vision_assist_tpu.pipeline.frame_processor import FrameProcessor
    from vision_assist_tpu.planning.wavefront import (
        closest_walkable_cell,
        find_paths,
    )
    from vision_assist_tpu.golden.pipeline import materialize_cells
    from vision_assist_tpu.semantics.analyser import InstructionEngine
    from vision_assist_tpu.semantics.sections import build_path
    from vision_assist_tpu.utils.profiling import StageTimer

    cfg = replay_config()
    cfg = cfg.replace(pathfinder=cfg.pathfinder.__class__(engine=args.engine))
    occ = jnp.asarray(load_scenario(args.scenario))
    fp = FrameProcessor(cfg, replay_rounding=True)
    timer = StageTimer(outlier_threshold_s=1.0)  # reference drops >1s YOLO frames

    seg = None
    frame = None
    if args.with_model:
        from vision_assist_tpu.models.inference import Segmenter

        seg = Segmenter(ModelConfig(imgsz=640),
                        example_hw=(cfg.frame_height, cfg.frame_width))
        frame = np.random.default_rng(0).integers(
            0, 255, (cfg.frame_height, cfg.frame_width, 3), dtype=np.uint8)
        seg(frame)  # compile

    # Compile the stage programs once before timing.
    g = cfg.grid.grid_size
    walk, art = inject_artificial_cells(
        occ, frame_width=cfg.frame_width, frame_height=cfg.frame_height)
    pen = penalty_field(walk)
    pk = find_peaks(rasterize_cells(walk))
    start = closest_walkable_cell(
        walk, jnp.array([cfg.frame_width // 2, cfg.frame_height]))
    goals = jax.vmap(lambda x, y: closest_walkable_cell(
        walk, jnp.stack([x, y])))(pk.centre_x, pk.centre_y)
    find_paths(walk, pen, start, goals, pk.valid).cells.block_until_ready()

    analyser = InstructionEngine(cfg.analyser)
    for i in range(args.frames):
        with timer.stage("yolo_detection"):
            if seg is not None:
                np.asarray(seg(frame).occupancy)
        with timer.stage("grid_detection"):
            walk, art = inject_artificial_cells(
                occ, frame_width=cfg.frame_width, frame_height=cfg.frame_height)
            walk.block_until_ready()
        with timer.stage("penalty_calculations"):
            pen = penalty_field(walk)
            pen.block_until_ready()
        with timer.stage("graph_creation"):
            pass  # adjacency is implicit in the array engines
        with timer.stage("protrusion_detection"):
            pk = find_peaks(rasterize_cells(walk))
            pk.valid.block_until_ready()
        with timer.stage("path_finding"):
            goals = jax.vmap(lambda x, y: closest_walkable_cell(
                walk, jnp.stack([x, y])))(pk.centre_x, pk.centre_y)
            start = closest_walkable_cell(
                walk, jnp.array([cfg.frame_width // 2, cfg.frame_height]))
            if args.engine == "wavefront":
                pb = find_paths(walk, pen, start, goals, pk.valid)
                pb.cells.block_until_ready()
            else:
                # exact: the engine FrameProcessor actually serves (native
                # C++ when buildable, numpy twin otherwise), one search per
                # valid peak. (exact_device's serving latency is measured
                # end-to-end by tools/diagnose_engines.py.)
                walk_np = np.asarray(walk)
                pen_np64 = np.asarray(pen, np.float64)
                start_t = tuple(np.asarray(start))
                goals_np = np.asarray(goals)
                exact_rows = [
                    fp._exact.find_path(walk_np, pen_np64, start_t,
                                        tuple(goals_np[k]), g)
                    for k in range(int(pk.valid.sum()))]
                # Wavefront results still feed the analysis stage below so
                # the profile covers every stage for every engine.
                pb = find_paths(walk, pen, start, goals, pk.valid)
                pb.cells.block_until_ready()
        with timer.stage("path_analysis"):
            paths = []
            pen_np = np.asarray(pen, np.float64)
            art_np = np.asarray(art)
            for k in range(int(pk.valid.sum())):
                L = int(pb.lengths[k])
                rc = [tuple(x) for x in np.asarray(pb.cells[k][:L])]
                paths.append(build_path(
                    materialize_cells(rc, pen_np, art_np, g),
                    float(pb.costs[k])))
            analyser(cfg.frame_height, cfg.frame_width, paths, i * 33)
        timer.end_frame()

    timer.write(args.timing_data_path)
    print(f"wrote {args.timing_data_path}")
    if args.samples_path:
        timer.write_samples(args.samples_path)
        print(f"wrote {args.samples_path}")
    for name, s in timer.summary().items():
        print(f"  {name:22s} avg {s['avg']*1000:8.3f} ms   "
              f"max {s['max']*1000:8.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
