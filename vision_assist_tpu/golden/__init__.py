"""Exact host-side twin of the reference pipeline.

Everything in this subpackage reproduces the reference's observable behaviour
bit-for-bit (including its quirks, catalogued in SURVEY.md §7 "hard parts") using
plain numpy. It serves three roles:

1. Golden generator for the 13 scenario fixtures
   (reference utilities/generate_testing_grids/examples/).
2. Differential oracle for the TPU array kernels in vision_assist_tpu.ops.
3. An exact "parity engine" the pipeline can select at runtime
   (PathFinderConfig.engine == "exact").
"""

from vision_assist_tpu.golden.lattice import (
    inject_artificial_cells,
    penalty_field,
    run_extents,
)
from vision_assist_tpu.golden.peaks import find_peaks, rasterize_cells
from vision_assist_tpu.golden.astar import AStarEngine, closest_cell_to_point

__all__ = [
    "inject_artificial_cells",
    "penalty_field",
    "run_extents",
    "find_peaks",
    "rasterize_cells",
    "AStarEngine",
    "closest_cell_to_point",
]
