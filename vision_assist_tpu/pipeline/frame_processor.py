"""Public FrameProcessor API — the framework's equivalent of the reference's
FrameProcessor.__call__ (FrameProcessor.py:301-360), redesigned TPU-first:

* the device side is two jitted programs (segmentation chain, planning step)
  over fixed shapes;
* the host side materialises the (tiny) selected paths and runs sectioning +
  instruction synthesis;
* all cross-frame state (instruction memory) is explicit — no singletons;
* ``engine="exact"`` routes pathfinding through the bit-exact host twin
  instead of the on-chip wavefront, for reference parity mode.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np

from vision_assist_tpu.config import PipelineConfig
from vision_assist_tpu.golden.astar import AStarEngine, closest_cell_to_point
from vision_assist_tpu.golden.pipeline import materialize_cells
from vision_assist_tpu.models.inference import Segmenter
from vision_assist_tpu.pipeline.planner import make_plan_step
from vision_assist_tpu.planning.dedup import deduplicate_paths
from vision_assist_tpu.semantics.analyser import InstructionEngine
from vision_assist_tpu.semantics.sections import AnalysedPath, build_path
from vision_assist_tpu.types import Coordinate, Peak


@dataclasses.dataclass
class FrameResult:
    final_answer: str
    paths: list[AnalysedPath]
    peaks: list[Peak]
    occupancy: np.ndarray
    walkable: np.ndarray
    artificial: np.ndarray
    penalty: np.ndarray
    overlay: Optional[np.ndarray] = None


class FrameProcessor:
    """Process frames (or saved occupancy lattices) into guidance answers.

    Args:
        cfg: pipeline configuration (shapes, thresholds, engine choice).
        segmenter: optional segmentation model wrapper; omit for replay mode.
        debug: when True, results carry a rendered overlay frame.
        replay_rounding: use the replay harness's artificial-row rounding
            (run_on_main.py:104) instead of the live pipeline's
            (FrameProcessor.py:126-127).
    """

    def __init__(self, cfg: PipelineConfig | None = None,
                 segmenter: Segmenter | None = None, debug: bool = False,
                 replay_rounding: bool = False):
        self.cfg = cfg or PipelineConfig()
        self.segmenter = segmenter
        self.debug = debug
        self._plan = make_plan_step(
            self.cfg, replay_rounding=replay_rounding,
            include_paths=self.cfg.pathfinder.engine != "exact")
        self.analyser = InstructionEngine(self.cfg.analyser)
        # Exact engine: prefer the native C++ implementation (bit-identical to
        # the numpy twin, ~40x faster); fall back when no compiler exists.
        self._exact = self._make_exact_engine()

    # -- device -> host path materialisation --------------------------------------

    def _make_exact_engine(self):
        """A fresh exact engine with its own cross-frame angle cache — one per
        stream, mirroring the reference's per-process PathFinder singleton."""
        pf = self.cfg.pathfinder
        kwargs = dict(
            angle_window=pf.angle_window, angle_grace_deg=pf.angle_grace_deg,
            angle_exponent=pf.angle_exponent,
            angle_denominator=pf.angle_denominator,
            penalty_weight=pf.penalty_weight, angle_weight=pf.angle_weight,
            replicate_radians_cache_bug=pf.replicate_radians_cache_bug,
        )
        from vision_assist_tpu.planning import native as native_engine

        if native_engine.available():
            return native_engine.NativeAStarEngine(**kwargs)
        return AStarEngine(**kwargs)

    def _paths_from_plan(self, plan, exact_engine=None
                         ) -> tuple[list[AnalysedPath], list[Peak]]:
        cfg = self.cfg
        g = cfg.grid.grid_size
        penalty = np.asarray(plan.penalty, np.float64)
        artificial = np.asarray(plan.artificial)
        walkable = np.asarray(plan.walkable)

        peaks = []
        n_peaks = int(plan.peaks.valid.sum())
        for i in range(n_peaks):
            peaks.append(Peak(
                centre=Coordinate(int(plan.peaks.centre_x[i]),
                                  int(plan.peaks.centre_y[i])),
                left=Coordinate(int(plan.peaks.left_x[i]),
                                int(plan.peaks.centre_y[i])),
                right=Coordinate(int(plan.peaks.right_x[i]),
                                 int(plan.peaks.centre_y[i])),
                orientation=("up", "left", "right")[int(plan.peaks.orientation[i])],
            ))

        raw: list[AnalysedPath] = []
        if cfg.pathfinder.engine == "exact":
            # Bit-parity mode: recompute the penalty field in float64 on the
            # host so costs match the reference exactly (the device field is
            # float32). Prefer the native implementation (bit-equal, faster).
            from vision_assist_tpu.planning.native import (
                available as native_available,
                native_penalty_field,
            )
            if native_available():
                penalty = native_penalty_field(
                    walkable,
                    saturation_threshold=cfg.penalty.saturation_threshold,
                    dominance_gain=cfg.penalty.dominance_gain)
            else:
                from vision_assist_tpu.golden.lattice import penalty_field as pf64
                penalty = pf64(
                    walkable,
                    saturation_threshold=cfg.penalty.saturation_threshold,
                    dominance_gain=cfg.penalty.dominance_gain)
            start = closest_cell_to_point(
                walkable, (cfg.frame_width // 2, cfg.frame_height), g)
            for peak in peaks:
                goal = closest_cell_to_point(
                    walkable, peak.centre.to_tuple(), g)
                if start is None or goal is None:
                    continue
                rc, cost = (exact_engine or self._exact).find_path(
                    walkable, penalty, start, goal, g)
                if rc:
                    raw.append(build_path(
                        materialize_cells(rc, penalty, artificial, g), cost,
                        min_straight=cfg.sections.min_straight_cells,
                        merge_below=cfg.sections.merge_below_cells,
                        sharp_angle_deg=cfg.sections.sharp_angle_deg))
        else:
            pb = plan.paths
            for i in range(n_peaks):
                if not bool(pb.valid[i]):
                    continue
                length = int(pb.lengths[i])
                rc = [tuple(x) for x in np.asarray(pb.cells[i][:length])]
                raw.append(build_path(
                    materialize_cells(rc, penalty, artificial, g),
                    float(pb.costs[i]),
                    min_straight=cfg.sections.min_straight_cells,
                    merge_below=cfg.sections.merge_below_cells,
                    sharp_angle_deg=cfg.sections.sharp_angle_deg))

        return deduplicate_paths(raw, cfg.dedup.similarity_threshold), peaks

    # -- entry points ---------------------------------------------------------------

    def process_occupancy(self, occupancy: np.ndarray,
                          now_ms: int | None = None,
                          frame: np.ndarray | None = None) -> FrameResult:
        """Model-bypassed entry point (the reference's saved-grid replay,
        run_on_main.py:147-201). ``occupancy`` is a bool (R, C) lattice."""
        import jax.numpy as jnp

        if now_ms is None:
            now_ms = int(time.time() * 1000)
        plan = self._plan(jnp.asarray(np.asarray(occupancy, dtype=bool)))
        paths, peaks = self._paths_from_plan(plan)
        answer = self.analyser(self.cfg.frame_height, self.cfg.frame_width,
                               paths, now_ms)
        result = FrameResult(
            final_answer=answer, paths=paths, peaks=peaks,
            occupancy=np.asarray(occupancy, dtype=bool),
            walkable=np.asarray(plan.walkable),
            artificial=np.asarray(plan.artificial),
            penalty=np.asarray(plan.penalty, np.float64),
        )
        if self.debug:
            from vision_assist_tpu.io.visualiser import render_overlay
            result.overlay = render_overlay(
                self.cfg, result, frame=frame)
        return result

    def __call__(self, frame_bgr: np.ndarray,
                 now_ms: int | None = None) -> FrameResult | None:
        """Full pipeline: segmentation + planning + analysis on one frame.

        Returns None for frames rejected by the blur gate (when enabled —
        the reference's gate is FrameProcessor.py:44-48, disabled by default
        at :314-319; the driver then retries the next frame, main.py:78-94).
        """
        if self.segmenter is None:
            raise ValueError(
                "FrameProcessor was built without a segmenter; use "
                "process_occupancy() for replay mode or pass a Segmenter.")
        if self.cfg.blur.enabled:
            import jax.numpy as jnp

            from vision_assist_tpu.ops.blur import laplacian_variance

            if float(laplacian_variance(jnp.asarray(frame_bgr))) \
                    < self.cfg.blur.laplacian_var_threshold:
                return None
        seg = self.segmenter(frame_bgr)
        return self.process_occupancy(
            np.asarray(seg.occupancy), now_ms=now_ms, frame=frame_bgr)
