"""Randomised differential fuzzing: run the ACTUAL reference implementation
against our exact engines on procedurally generated occupancy lattices —
parity evidence beyond the 13 hand-drawn fixtures.

Generates blob-like walkable regions (random walks + dilation) at several
sizes, then requires bit-identical penalties, peaks, paths/costs and final
answers. Skipped when the reference checkout is unavailable.
"""

from __future__ import annotations

import math
import pathlib

import numpy as np
import pytest

from vision_assist_tpu.config import PipelineConfig, GridConfig
from vision_assist_tpu.golden.pipeline import GoldenReplayPipeline

REFERENCE = pathlib.Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not (REFERENCE / "models.py").exists(),
    reason="reference checkout not available",
)


def random_lattice(rng: np.random.Generator, rows: int, cols: int) -> np.ndarray:
    """Blob-like walkable region: a few random walks from the bottom, dilated."""
    occ = np.zeros((rows, cols), bool)
    for _ in range(rng.integers(1, 4)):
        r = rows - 1
        c = int(rng.integers(cols // 4, 3 * cols // 4))
        width = int(rng.integers(2, 6))
        while r > int(rng.integers(2, rows // 2)):
            occ[max(r, 0), max(c - width, 0):min(c + width + 1, cols)] = True
            r -= 1
            c = int(np.clip(c + rng.integers(-2, 3), 1, cols - 2))
            if rng.random() < 0.1:
                width = int(np.clip(width + rng.integers(-1, 2), 1, 7))
    # Random holes.
    holes = rng.random((rows, cols)) < 0.03
    occ &= ~holes
    return occ


@pytest.fixture(scope="module")
def ref(request):
    import sys
    import types

    shim = pathlib.Path("/tmp/vision_assist_refshim")
    shim.mkdir(exist_ok=True)
    link = shim / "vision_assist"
    if not link.exists():
        link.symlink_to(REFERENCE)
    if str(shim) not in sys.path:
        sys.path.insert(0, str(shim))
    if "ultralytics" not in sys.modules:
        stub = types.ModuleType("ultralytics")
        stub.YOLO = object
        sys.modules["ultralytics"] = stub
    from tests.test_reference_differential import reference_frame

    import vision_assist.models as ref_models
    import vision_assist.PenaltyCalculator as ref_pc
    import vision_assist.PathFinder as ref_pf
    import vision_assist.ProtrusionDetector as ref_pd
    import vision_assist.PathAnalyser as ref_pa
    from vision_assist.FrameProcessor import FrameProcessor as RefFrameProcessor

    return types.SimpleNamespace(
        models=ref_models, pc=ref_pc, pf=ref_pf, pd=ref_pd, pa=ref_pa,
        FrameProcessor=RefFrameProcessor, run=reference_frame,
    )


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_64x36(ref, seed):
    rng = np.random.default_rng(seed)
    occ = random_lattice(rng, 64, 36)
    theirs = ref.run(ref, occ)
    mine = GoldenReplayPipeline().process(occ)

    ref_pen = np.array([[(g.penalty or 0.0) for g in row]
                        for row in theirs.grids], np.float64)
    np.testing.assert_array_equal(mine.penalty, ref_pen)

    assert len(mine.peaks) == len(theirs.peaks), seed
    for mp, tp in zip(mine.peaks, theirs.peaks):
        assert (mp.centre.x, mp.centre.y) == (tp.x, tp.y)

    assert len(mine.raw_paths) == len(theirs.raw_paths), seed
    for mp, tp in zip(mine.raw_paths, theirs.raw_paths):
        assert [(c.coords.x, c.coords.y) for c in mp.cells] == \
            [(g.coords.x, g.coords.y) for g in tp.grids], seed
        assert math.isclose(mp.total_cost, tp.total_cost, abs_tol=1e-9), seed

    assert mine.final_answer == theirs.answer, seed


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_native_engine_random(seed):
    from vision_assist_tpu.planning import native

    if not native.available():
        pytest.skip("no C++ toolchain")
    from vision_assist_tpu.golden.astar import AStarEngine, closest_cell_to_point
    from vision_assist_tpu.golden.lattice import inject_artificial_cells, penalty_field

    rng = np.random.default_rng(100 + seed)
    occ = random_lattice(rng, 64, 36)
    walk, _ = inject_artificial_cells(occ, 720, 1280)
    pen = penalty_field(walk)
    start = closest_cell_to_point(walk, (360, 1280))
    # Random goals across the top half.
    py_eng = AStarEngine()
    nat_eng = native.NativeAStarEngine()
    for _ in range(4):
        goal = closest_cell_to_point(
            walk, (int(rng.integers(0, 720)), int(rng.integers(0, 640))))
        p1, c1 = py_eng.find_path(walk, pen, start, goal)
        p2, c2 = nat_eng.find_path(walk, pen, start, goal)
        assert p1 == p2
        assert c1 == c2 or math.isclose(c1, c2, abs_tol=0)
