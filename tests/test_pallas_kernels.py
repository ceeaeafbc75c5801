"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on TPU
by bench/profile runs)."""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vision_assist_tpu.golden.pipeline import GoldenReplayPipeline
from vision_assist_tpu.io.scenarios import load_scenario, scenario_names
from vision_assist_tpu.ops.pallas_wavefront import relax_pallas
from vision_assist_tpu.planning.wavefront import closest_walkable_cell, relax


@pytest.mark.parametrize("name", ["right_turn", "insane_case",
                                  "two_global_peaks"])
def test_pallas_relax_matches_xla(name):
    gold = GoldenReplayPipeline().process(load_scenario(name))
    walk = jnp.asarray(gold.walkable)
    pen = jnp.asarray(gold.penalty, jnp.float32)
    start = closest_walkable_cell(walk, jnp.array([360, 1280]))
    ref = np.asarray(relax(walk, pen, start, angle_weight=1e-4))
    pal = np.asarray(relax_pallas(walk, pen, start, interpret=True))
    np.testing.assert_array_equal(pal, ref)


def test_find_paths_use_pallas_flag_matches():
    """find_paths(use_pallas=True) (auto-interpret off-TPU) returns the same
    PathBatch as the XLA relaxation."""
    from vision_assist_tpu.planning.wavefront import find_paths

    gold = GoldenReplayPipeline().process(load_scenario("right_turn"))
    walk = jnp.asarray(gold.walkable)
    pen = jnp.asarray(gold.penalty, jnp.float32)
    start = closest_walkable_cell(walk, jnp.array([360, 1280]))
    goals = jnp.stack([start + jnp.array([-20, 0])])  # any reachable cell
    valid = jnp.array([True])
    a = find_paths(walk, pen, start, goals, valid, angle_weight=1e-4)
    b = find_paths(walk, pen, start, goals, valid, angle_weight=1e-4,
                   use_pallas=True)
    np.testing.assert_array_equal(np.asarray(a.cells), np.asarray(b.cells))
    np.testing.assert_array_equal(np.asarray(a.costs), np.asarray(b.costs))


def test_pallas_relax_unreachable_stays_inf():
    walk = np.zeros((8, 8), bool)
    walk[0, 0] = walk[7, 7] = True
    d = np.asarray(relax_pallas(
        jnp.asarray(walk), jnp.zeros((8, 8), jnp.float32),
        jnp.asarray([0, 0]), interpret=True))
    assert d[0, 0].min() == 0.0
    assert d[7, 7].min() > 1e30
