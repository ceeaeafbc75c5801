"""Differential tests: run the ACTUAL reference implementation (mounted
read-only at /root/reference) next to this framework's exact host twin and
require bit-identical outputs on all 13 scenario fixtures, stage by stage.

Skipped automatically when the reference checkout is unavailable.
"""

from __future__ import annotations

import math
import sys
import types
import pathlib

import numpy as np
import pytest

REFERENCE = pathlib.Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not (REFERENCE / "models.py").exists(),
    reason="reference checkout not available",
)

GRID = 20


@pytest.fixture(scope="module")
def ref():
    """Import the reference as the `vision_assist` package with ultralytics
    stubbed out (it is only needed for live YOLO inference)."""
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

    import vision_assist.models as ref_models
    import vision_assist.PenaltyCalculator as ref_pc
    import vision_assist.PathFinder as ref_pf
    import vision_assist.ProtrusionDetector as ref_pd
    import vision_assist.PathAnalyser as ref_pa
    from vision_assist.FrameProcessor import FrameProcessor as RefFrameProcessor

    return types.SimpleNamespace(
        models=ref_models, pc=ref_pc, pf=ref_pf, pd=ref_pd, pa=ref_pa,
        FrameProcessor=RefFrameProcessor,
    )


def build_reference_lattice(ref, occ: np.ndarray):
    """Reconstruct grids/grid_lookup the way the reference replay harness does
    (run_on_main.py:45-145): full-frame lattice + artificial cells from
    0.8375*H with the unconditional round-up."""
    Coordinate, Grid = ref.models.Coordinate, ref.models.Grid
    rows, cols = occ.shape
    frame_h, frame_w = rows * GRID, cols * GRID

    art_xs = set(range(frame_w // 2 - GRID * 8, frame_w // 2 + GRID * 9, GRID))

    grids, lookup = [], {}
    for r in range(rows):
        row_cells = []
        for c in range(cols):
            x, y = c * GRID, r * GRID
            g = Grid(
                coords=Coordinate(x=x, y=y),
                centre=Coordinate(x=x + GRID // 2, y=y + GRID // 2),
                penalty=None, row=r, col=c,
                empty=not bool(occ[r, c]), artificial=False,
            )
            row_cells.append(g)
            lookup[(x, y)] = g
        grids.append(row_cells)

    start_y = int(frame_h * 0.8375) + (GRID - int(frame_h * 0.8375) % GRID)
    for y in range(start_y, frame_h, GRID):
        r = y // GRID
        row_cells = []
        for x in range(0, frame_w, GRID):
            prev = lookup.get((x, y))
            previously_empty = prev.empty if prev else True
            if previously_empty:
                empty, artificial = (x not in art_xs), (x in art_xs)
            else:
                empty, artificial = False, False
            g = Grid(
                coords=Coordinate(x=x, y=y),
                centre=Coordinate(x=x + GRID // 2, y=y + GRID // 2),
                penalty=None, row=r, col=x // GRID,
                empty=empty, artificial=artificial,
            )
            lookup[(x, y)] = g
            row_cells.append(g)
        if r < len(grids):
            grids[r] = row_cells
        else:
            grids.append(row_cells)
    return grids, lookup, frame_h, frame_w


def reference_frame(ref, occ: np.ndarray):
    """Run the reference stages end to end on one occupancy lattice, with all
    cross-frame singleton state reset, and return every intermediate."""
    grids, lookup, frame_h, frame_w = build_reference_lattice(ref, occ)

    np_grids = np.array(
        [[0 if g.empty else 1 for g in row] for row in grids], dtype=np.uint8
    )

    pc = ref.pc.penalty_calculator
    pc._pre_compute_easy_segments(np_grids, grids)
    for row in grids:
        for g in row:
            if not g.empty:
                g.penalty = pc.calculate_penalty(g, lookup)

    # Fresh pathfinder/analyser state (the module singletons persist caches).
    ref.pf.PathFinder._instance = None
    pathfinder = ref.pf.PathFinder()
    pathfinder.angle_cache = {}
    ref.pa.PathAnalyser._instance = None
    analyser = ref.pa.PathAnalyser()
    analyser.previous_instructions = {}

    ref.pd.ProtrusionDetector._instance = None
    detector = ref.pd.ProtrusionDetector(debug=False, imshow=False)
    frame = np.zeros((frame_h, frame_w, 3), dtype=np.uint8)
    peaks = detector(frame, grids, lookup)

    # Graph + search, per FrameProcessor._create_graph/_find_paths.
    ref.FrameProcessor._instance = None
    ref.FrameProcessor._initialized = False
    fp = ref.FrameProcessor(model=None, verbose=False, debug=False, imshow=False)
    fp.grids, fp.grid_lookup, fp.frame = grids, lookup, frame
    graph = ref.FrameProcessor._create_graph(fp)

    from vision_assist.utils import get_closest_grid_to_point
    start_grid = get_closest_grid_to_point(
        ref.models.Coordinate(x=frame_w // 2, y=frame_h), grids)

    raw_paths = []
    for peak in peaks:
        end_grid = get_closest_grid_to_point(peak, grids)
        grid_path, cost = pathfinder.find_path(graph, start_grid, end_grid, lookup)
        if grid_path:
            raw_paths.append(ref.models.Path(
                grids=grid_path, total_cost=cost, path_type="path"))

    paths = ref.FrameProcessor._find_paths_dedup(fp, raw_paths) \
        if hasattr(ref.FrameProcessor, "_find_paths_dedup") else None
    if paths is None:
        # Replicate FrameProcessor._find_paths' dedup loop (py:255-269).
        unique = []
        ordered = sorted(raw_paths, key=lambda p: len(p.grids), reverse=True)
        for p in ordered:
            if all(ref.FrameProcessor._calculate_path_similarity(fp, p, q) < 0.90
                   for q in unique):
                unique.append(p)
        paths = unique

    answer = analyser(frame_h, frame_w, paths)

    return types.SimpleNamespace(
        grids=grids, lookup=lookup, np_grids=np_grids, peaks=peaks,
        start_grid=start_grid, raw_paths=raw_paths, paths=paths, answer=answer,
        frame_h=frame_h, frame_w=frame_w,
    )


@pytest.fixture(scope="module")
def scenarios():
    from vision_assist_tpu.io.scenarios import load_scenario, scenario_names
    return {name: load_scenario(name) for name in scenario_names()}


@pytest.fixture(scope="module")
def mine_and_theirs(ref, scenarios):
    from vision_assist_tpu.golden.pipeline import GoldenReplayPipeline
    out = {}
    for name, occ in scenarios.items():
        theirs = reference_frame(ref, occ)
        mine = GoldenReplayPipeline().process(occ)
        out[name] = (mine, theirs)
    return out


def test_lattice_matches(mine_and_theirs):
    for name, (mine, theirs) in mine_and_theirs.items():
        ref_walkable = theirs.np_grids.astype(bool)
        np.testing.assert_array_equal(
            mine.walkable, ref_walkable, err_msg=f"walkable mismatch: {name}")
        ref_art = np.array(
            [[g.artificial for g in row] for row in theirs.grids], dtype=bool)
        np.testing.assert_array_equal(
            mine.artificial, ref_art, err_msg=f"artificial mismatch: {name}")


def test_penalty_field_matches(mine_and_theirs):
    for name, (mine, theirs) in mine_and_theirs.items():
        ref_pen = np.array(
            [[(g.penalty or 0.0) for g in row] for row in theirs.grids],
            dtype=np.float64)
        np.testing.assert_array_equal(
            mine.penalty, ref_pen, err_msg=f"penalty mismatch: {name}")


def test_peaks_match(mine_and_theirs):
    for name, (mine, theirs) in mine_and_theirs.items():
        assert len(mine.peaks) == len(theirs.peaks), name
        for mp, tp in zip(mine.peaks, theirs.peaks):
            assert (mp.centre.x, mp.centre.y) == (tp.x, tp.y), name


def test_paths_match(mine_and_theirs):
    for name, (mine, theirs) in mine_and_theirs.items():
        assert len(mine.raw_paths) == len(theirs.raw_paths), name
        for mp, tp in zip(mine.raw_paths, theirs.raw_paths):
            mine_px = [(c.coords.x, c.coords.y) for c in mp.cells]
            ref_px = [(g.coords.x, g.coords.y) for g in tp.grids]
            assert mine_px == ref_px, f"path cells mismatch: {name}"
            assert math.isclose(mp.total_cost, tp.total_cost,
                                rel_tol=0, abs_tol=1e-9), \
                f"path cost mismatch: {name}: {mp.total_cost} vs {tp.total_cost}"


def test_sections_and_corners_match(mine_and_theirs):
    for name, (mine, theirs) in mine_and_theirs.items():
        for mp, tp in zip(mine.paths, theirs.paths):
            tsec = tp.sections or []
            assert len(mp.sections) == len(tsec), name
            for ms, ts in zip(mp.sections, tsec):
                assert ms.path_type == ts.path_type, name
                assert [(c.coords.x, c.coords.y) for c in ms.cells] == \
                    [(g.coords.x, g.coords.y) for g in ts.grids], name
                assert math.isclose(ms.total_cost, ts.total_cost, abs_tol=1e-9), name
            tcor = tp.corners or []
            assert len(mp.corners) == len(tcor), name
            for mc, tc in zip(mp.corners, tcor):
                assert mc.direction == tc.direction, name
                assert mc.sharpness == tc.sharpness, name
                assert mc.shape == tc.shape, name
                assert math.isclose(mc.angle_change, tc.angle_change,
                                    abs_tol=1e-9), name


def test_final_answer_matches(mine_and_theirs):
    for name, (mine, theirs) in mine_and_theirs.items():
        assert mine.final_answer == theirs.answer, name


def test_empty_paths_answer_matches_reference(ref):
    """VERDICT r4 #7: the no-detection case pinned against the ACTUAL
    reference analyser — an empty path list must map to the same final
    answer on both sides (PathAnalyser.py:291-292 returns
    FinalAnswer.CONTINUE_FORWARD when no instructions survive)."""
    from vision_assist_tpu.config import AnalyserConfig
    from vision_assist_tpu.semantics.analyser import InstructionEngine

    ref.pa.PathAnalyser._instance = None
    theirs = ref.pa.PathAnalyser()
    theirs.previous_instructions = {}
    ref_answer = theirs(720, 1280, [])
    ref_value = getattr(ref_answer, "value", ref_answer)

    mine = InstructionEngine(AnalyserConfig())
    my_answer = mine(720, 1280, [], now_ms=0)
    assert my_answer == ref_value
