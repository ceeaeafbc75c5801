"""Differential tests: the on-chip exact A* (planning/device_astar.py) vs
the host twin (golden/astar.py) — selected paths must be IDENTICAL on every
scenario fixture, including insane_case (the fixture the Markovian wavefront
cannot reproduce), and on fuzz lattices. Costs agree to f32 tolerance."""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vision_assist_tpu.config import replay_config
from vision_assist_tpu.golden.astar import AStarEngine, closest_cell_to_point
from vision_assist_tpu.golden.lattice import (
    inject_artificial_cells,
    penalty_field,
)
from vision_assist_tpu.golden.peaks import find_peaks, rasterize_cells
from vision_assist_tpu.io.scenarios import load_scenario, scenario_names
from vision_assist_tpu.planning.device_astar import (
    device_astar,
    device_astar_paths,
    empty_cache,
)

CFG = replay_config()


def _scenario_inputs(occ):
    g = CFG.grid.grid_size
    h, w = CFG.frame_height, CFG.frame_width
    walkable, artificial = inject_artificial_cells(
        occ, w, h, g,
        half_span=CFG.grid.artificial_half_span_cells,
        row_start_frac=CFG.grid.artificial_row_start_frac,
        replay_rounding=True)
    penalty = penalty_field(
        walkable,
        saturation_threshold=CFG.penalty.saturation_threshold,
        dominance_gain=CFG.penalty.dominance_gain)
    peaks = find_peaks(rasterize_cells(walkable, h, w, g), g)
    start = closest_cell_to_point(walkable, (w // 2, h), g)
    goals = []
    for p in peaks:
        goal = closest_cell_to_point(walkable, p.centre.to_tuple(), g)
        if goal is not None:
            goals.append(goal)
    return walkable, penalty, start, goals


def _host_paths(walkable, penalty, start, goals):
    eng = AStarEngine()  # fresh cache, like a fresh PathFinder singleton
    out = []
    for goal in goals:
        out.append(eng.find_path(walkable, penalty, start, goal,
                                 CFG.grid.grid_size))
    return out


class TestDeviceAStarFixtures:
    @pytest.mark.parametrize("name", scenario_names())
    def test_paths_match_host_twin(self, name):
        occ = load_scenario(name)
        walkable, penalty, start, goals = _scenario_inputs(occ)
        assert start is not None and goals

        host = _host_paths(walkable, penalty, start, goals)

        K = len(goals)
        batch, _ = device_astar_paths(
            jnp.asarray(walkable), jnp.asarray(penalty, jnp.float32),
            jnp.asarray(start, jnp.int32),
            jnp.asarray(goals, jnp.int32).reshape(K, 2),
            jnp.ones((K,), bool), empty_cache(),
            grid_size=CFG.grid.grid_size,
            max_len=CFG.pathfinder.max_path_len)

        for k, (h_path, h_cost) in enumerate(host):
            length = int(batch.lengths[k])
            d_path = [tuple(x) for x in np.asarray(batch.cells[k][:length])]
            assert d_path == h_path, (
                f"{name} goal {k}: device path diverges\n"
                f"host   ({len(h_path)}): {h_path[:12]}...\n"
                f"device ({length}): {d_path[:12]}...")
            if h_path:
                assert np.isclose(float(batch.costs[k]), h_cost,
                                  rtol=2e-5), (name, k)


class TestDeviceAStarUnits:
    def test_start_equals_goal(self):
        walkable = np.ones((8, 8), bool)
        penalty = np.zeros((8, 8), np.float32)
        res = device_astar(jnp.asarray(walkable), jnp.asarray(penalty),
                           jnp.array([7, 4], jnp.int32),
                           jnp.array([7, 4], jnp.int32), empty_cache(),
                           max_len=64)
        assert int(res.length) == 1
        assert float(res.cost) == 0.0

    def test_unreachable_goal(self):
        walkable = np.zeros((8, 8), bool)
        walkable[7, :] = True
        walkable[0, :] = True  # island
        penalty = np.zeros((8, 8), np.float32)
        res = device_astar(jnp.asarray(walkable), jnp.asarray(penalty),
                           jnp.array([7, 4], jnp.int32),
                           jnp.array([0, 4], jnp.int32), empty_cache(),
                           max_len=64)
        # The reference RELAXES into empty cells (dead ends), so the empty
        # corridor between the strips is crossable one step deep but the
        # search cannot pass through it... unless the lattice is 8 tall with
        # one empty row gap bridged by a dead-end? Verify against the twin.
        eng = AStarEngine()
        h_path, h_cost = eng.find_path(walkable, penalty.astype(np.float64),
                                       (7, 4), (0, 4), 20)
        if h_path:
            assert int(res.length) == len(h_path)
        else:
            assert int(res.length) == 0 and not np.isfinite(float(res.cost))

    def test_cache_carries_across_goals(self):
        """Second search with a warmed cache must match the host twin's
        second search (same engine), NOT a fresh engine's."""
        rng = np.random.default_rng(7)
        occ = rng.random((64, 36)) > 0.35
        walkable, penalty, start, goals = _scenario_inputs(occ)
        if start is None or len(goals) < 2:
            pytest.skip("fixture did not produce 2 goals")
        host = _host_paths(walkable, penalty, start, goals[:2])
        batch, _ = device_astar_paths(
            jnp.asarray(walkable), jnp.asarray(penalty, jnp.float32),
            jnp.asarray(start, jnp.int32),
            jnp.asarray(goals[:2], jnp.int32),
            jnp.ones((2,), bool), empty_cache(),
            max_len=CFG.pathfinder.max_path_len)
        for k, (h_path, _) in enumerate(host):
            length = int(batch.lengths[k])
            d_path = [tuple(x) for x in np.asarray(batch.cells[k][:length])]
            assert d_path == h_path


class TestDeviceAStarFuzz:
    @pytest.mark.parametrize("seed", range(6))
    def test_random_lattices(self, seed):
        rng = np.random.default_rng(seed)
        occ = rng.random((64, 36)) > rng.uniform(0.25, 0.5)
        walkable, penalty, start, goals = _scenario_inputs(occ)
        if start is None or not goals:
            pytest.skip("no goals")
        goals = goals[:3]
        host = _host_paths(walkable, penalty, start, goals)
        batch, _ = device_astar_paths(
            jnp.asarray(walkable), jnp.asarray(penalty, jnp.float32),
            jnp.asarray(start, jnp.int32),
            jnp.asarray(goals, jnp.int32),
            jnp.ones((len(goals),), bool), empty_cache(),
            max_len=CFG.pathfinder.max_path_len)
        for k, (h_path, h_cost) in enumerate(host):
            length = int(batch.lengths[k])
            d_path = [tuple(x) for x in np.asarray(batch.cells[k][:length])]
            assert d_path == h_path, f"seed {seed} goal {k}"
