"""End-to-end tests for the public FrameProcessor API."""

from __future__ import annotations

import json
import pathlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from vision_assist_tpu.config import PipelineConfig, replay_config
from vision_assist_tpu.io.scenarios import load_scenario, scenario_names
from vision_assist_tpu.pipeline.frame_processor import FrameProcessor

GOLDENS = pathlib.Path(__file__).parent / "fixtures" / "goldens"


def _replay_cfg(engine: str) -> PipelineConfig:
    cfg = replay_config()
    return cfg.replace(pathfinder=cfg.pathfinder.__class__(engine=engine))


class TestExactEngineParity:
    """engine="exact" must reproduce the reference bit-for-bit on every
    scenario through the PUBLIC API (paths, peaks, and final answer)."""

    @pytest.mark.parametrize("name", scenario_names())
    def test_matches_golden(self, name):
        fp = FrameProcessor(_replay_cfg("exact"), replay_rounding=True)
        res = fp.process_occupancy(load_scenario(name), now_ms=0)
        gold = json.loads((GOLDENS / f"{name}.json").read_text())

        assert res.final_answer == gold["final_answer"]
        assert len(res.peaks) == len(gold["peaks"])
        for mine, gp in zip(res.peaks, gold["peaks"]):
            assert [mine.centre.x, mine.centre.y] == gp["centre"]
        assert len(res.paths) == len(gold["paths"])
        for p, gp in zip(res.paths, gold["paths"]):
            assert [[c.row, c.col] for c in p.cells] == gp["cells_rc"]


class TestWavefrontEngine:
    def test_runs_and_produces_answer(self):
        fp = FrameProcessor(_replay_cfg("wavefront"), replay_rounding=True)
        res = fp.process_occupancy(load_scenario("right_turn"), now_ms=0)
        assert res.final_answer in (
            "move_left", "move_right", "continue_forward")
        assert res.paths and res.paths[0].cells

    def test_debug_overlay(self):
        fp = FrameProcessor(_replay_cfg("wavefront"), debug=True,
                            replay_rounding=True)
        res = fp.process_occupancy(load_scenario("right_turn"), now_ms=0)
        assert res.overlay is not None
        assert res.overlay.shape == (1280, 720, 3)
        assert res.overlay.any()


class TestTemporalState:
    def test_memory_accumulates_and_prunes(self):
        fp = FrameProcessor(_replay_cfg("exact"), replay_rounding=True)
        occ = load_scenario("sharp_right_on_path")
        fp.process_occupancy(occ, now_ms=0)
        fp.process_occupancy(occ, now_ms=500)
        assert len(fp.analyser.previous_instructions) == 2
        fp.process_occupancy(occ, now_ms=60_000)  # far beyond the 5 s window
        assert list(fp.analyser.previous_instructions) == [60_000]

    def test_requires_segmenter_for_frames(self):
        fp = FrameProcessor(_replay_cfg("exact"))
        with pytest.raises(ValueError, match="segmenter"):
            fp(np.zeros((1280, 720, 3), np.uint8))
