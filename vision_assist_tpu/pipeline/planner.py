"""The jitted planning step: occupancy lattice -> paths + fields.

This is the non-model half of the frame program (SURVEY.md §7 M1): artificial
cells, penalty field, rasterised peaks, start/goal selection and the wavefront
search, fused into ONE jitted function with static shapes that vmaps over a
stream axis. The model half (models/inference.py) produces the input
occupancy; the replay harness feeds saved occupancy directly (the reference's
YOLO-bypass pattern, run_on_main.py:147-201).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vision_assist_tpu.config import PipelineConfig
from vision_assist_tpu.ops.lattice import inject_artificial_cells, rasterize_cells
from vision_assist_tpu.ops.peaks import PeakSet, find_peaks
from vision_assist_tpu.ops.penalty import penalty_field
from vision_assist_tpu.planning.wavefront import (
    PathBatch,
    closest_walkable_cell,
    find_paths,
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PlanResult:
    walkable: jax.Array     # (R, C) bool
    artificial: jax.Array   # (R, C) bool
    penalty: jax.Array      # (R, C) f32
    peaks: PeakSet
    start_rc: jax.Array     # (2,) int32
    paths: PathBatch | None  # None when built with include_paths=False
    # Updated angle cache (engine="exact_device" only) — cross-frame state
    # the caller feeds back into the next plan call (the reference's
    # PathFinder singleton cache, PathFinder.py:32).
    astar_cache: jax.Array | None = None

    def tree_flatten(self):
        return ((self.walkable, self.artificial, self.penalty, self.peaks,
                 self.start_rc, self.paths, self.astar_cache), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def make_plan_step(cfg: PipelineConfig, replay_rounding: bool = False,
                   include_paths: bool = True):
    """Build the jitted planning function for a fixed config.

    Returned fn: occupancy (R, C) bool -> PlanResult. Batch with jax.vmap.

    include_paths=False omits the wavefront relaxation (PlanResult.paths is
    None) — used when the pipeline plans with the exact host engine, so the
    device program only produces the fields/peaks it actually consumes.
    """
    g = cfg.grid.grid_size
    pf = cfg.pathfinder
    exact_device = cfg.pathfinder.engine == "exact_device"

    def _fields(occupancy):
        walkable, artificial = inject_artificial_cells(
            occupancy,
            frame_width=cfg.frame_width, frame_height=cfg.frame_height,
            grid_size=g, half_span=cfg.grid.artificial_half_span_cells,
            row_start_frac=cfg.grid.artificial_row_start_frac,
            replay_rounding=replay_rounding,
        )
        penalty = penalty_field(
            walkable,
            saturation_threshold=cfg.penalty.saturation_threshold,
            dominance_gain=cfg.penalty.dominance_gain,
        )
        peaks = find_peaks(rasterize_cells(walkable, g), g,
                           max_peaks=cfg.peaks.max_peaks)
        start = closest_walkable_cell(
            walkable, jnp.array([cfg.frame_width // 2, cfg.frame_height]), g)
        goals = jax.vmap(
            lambda x, y: closest_walkable_cell(walkable, jnp.stack([x, y]), g)
        )(peaks.centre_x, peaks.centre_y)
        return walkable, artificial, penalty, peaks, start, goals

    if exact_device and include_paths:
        from vision_assist_tpu.planning.device_astar import (
            device_astar_paths,
        )

        @jax.jit
        def plan(occupancy: jax.Array, astar_cache: jax.Array) -> PlanResult:
            walkable, artificial, penalty, peaks, start, goals = _fields(
                occupancy)
            paths, cache_out = device_astar_paths(
                walkable, penalty, start, goals, peaks.valid, astar_cache,
                grid_size=g, max_len=pf.max_path_len,
                angle_window=pf.angle_window,
                angle_grace_deg=pf.angle_grace_deg,
                angle_exponent=pf.angle_exponent,
                angle_denominator=pf.angle_denominator,
                penalty_weight=pf.penalty_weight,
                angle_weight=pf.angle_weight,
                replicate_radians_cache_bug=pf.replicate_radians_cache_bug)
            return PlanResult(walkable=walkable, artificial=artificial,
                              penalty=penalty, peaks=peaks, start_rc=start,
                              paths=paths, astar_cache=cache_out)

        return plan

    @jax.jit
    def plan(occupancy: jax.Array) -> PlanResult:
        walkable, artificial, penalty, peaks, start, goals = _fields(
            occupancy)
        paths = None
        if include_paths:
            paths = find_paths(
                walkable, penalty, start, goals, peaks.valid,
                grid_size=g, max_len=pf.max_path_len,
                penalty_weight=pf.penalty_weight,
                angle_weight=pf.wavefront_turn_weight,
                angle_grace_deg=pf.angle_grace_deg,
                angle_exponent=pf.angle_exponent,
                angle_denominator=pf.angle_denominator,
                use_pallas=pf.use_pallas_relax,
                use_sweep=pf.use_sweep_relax,
            )
        return PlanResult(walkable=walkable, artificial=artificial,
                          penalty=penalty, peaks=peaks, start_rc=start,
                          paths=paths)

    return plan
