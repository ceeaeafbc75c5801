"""Differential tests: native C++ planning engine vs the numpy exact twin.

The native engine must be BIT-identical (paths and float64 costs) — it is the
default exact engine inside FrameProcessor.
"""

from __future__ import annotations

import numpy as np
import pytest

from vision_assist_tpu.golden.astar import AStarEngine, closest_cell_to_point
from vision_assist_tpu.golden.pipeline import GoldenReplayPipeline
from vision_assist_tpu.io.scenarios import load_scenario, scenario_names
from vision_assist_tpu.planning import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain to build the engine")


@pytest.fixture(scope="module")
def goldens():
    return {n: GoldenReplayPipeline().process(load_scenario(n))
            for n in scenario_names()}


def test_penalty_bit_identical(goldens):
    for name, gold in goldens.items():
        got = native.native_penalty_field(gold.walkable)
        np.testing.assert_array_equal(got, gold.penalty, err_msg=name)


@pytest.mark.parametrize("bug_mode", [True, False])
def test_paths_bit_identical(goldens, bug_mode):
    for name, gold in goldens.items():
        py = AStarEngine(replicate_radians_cache_bug=bug_mode)
        nat = native.NativeAStarEngine(replicate_radians_cache_bug=bug_mode)
        start = gold.start_cell
        for peak in gold.peaks:
            goal = closest_cell_to_point(gold.walkable, peak.centre.to_tuple())
            p1, c1 = py.find_path(gold.walkable, gold.penalty, start, goal)
            p2, c2 = nat.find_path(gold.walkable, gold.penalty, start, goal)
            assert p1 == p2, name
            assert c1 == c2, (name, c1, c2)


def test_cache_persists_across_calls(goldens):
    gold = goldens["right_turn"]
    nat = native.NativeAStarEngine()
    start = gold.start_cell
    goal = closest_cell_to_point(gold.walkable, gold.peaks[0].centre.to_tuple())
    nat.find_path(gold.walkable, gold.penalty, start, goal)
    size1 = nat.cache_size
    assert size1 > 0
    nat.find_path(gold.walkable, gold.penalty, start, goal)
    assert nat.cache_size == size1  # warm cache, no new keys


def test_unreachable_returns_empty():
    w = np.zeros((5, 5), bool)
    w[0, 0] = w[4, 4] = True
    nat = native.NativeAStarEngine()
    path, cost = nat.find_path(w, np.zeros((5, 5)), (4, 4), (0, 0))
    assert path == [] and cost == float("inf")


def test_frame_processor_uses_native(goldens):
    from vision_assist_tpu.config import replay_config
    from vision_assist_tpu.pipeline.frame_processor import FrameProcessor

    cfg = replay_config()
    cfg = cfg.replace(pathfinder=cfg.pathfinder.__class__(engine="exact"))
    fp = FrameProcessor(cfg, replay_rounding=True)
    assert isinstance(fp._exact, native.NativeAStarEngine)
    res = fp.process_occupancy(load_scenario("right_turn"), now_ms=0)
    gold = goldens["right_turn"]
    assert res.final_answer == gold.final_answer
    assert [(c.row, c.col) for c in res.paths[0].cells] == \
        [(c.row, c.col) for c in gold.paths[0].cells]
