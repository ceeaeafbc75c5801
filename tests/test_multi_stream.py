"""Multi-stream batched serving tests, including an 8-device CPU mesh."""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from vision_assist_tpu.config import replay_config
from vision_assist_tpu.io.scenarios import load_scenario, scenario_names
from vision_assist_tpu.pipeline.frame_processor import FrameProcessor
from vision_assist_tpu.pipeline.multi_stream import MultiStreamProcessor


def _cfg(n):
    import dataclasses

    cfg = replay_config()
    # These tests exercise the on-chip wavefront path of the batched server
    # (the default is the exact host engine); pin the single-stream
    # comparison to the same engine.
    return cfg.replace(
        num_streams=n,
        pathfinder=dataclasses.replace(cfg.pathfinder, engine="wavefront"))


class TestMultiStream:
    def test_matches_single_stream_results(self):
        names = ["right_turn", "left_turn", "obstacle_ahead", "insane_case"]
        occ = np.stack([load_scenario(n) for n in names])
        msp = MultiStreamProcessor(_cfg(4), replay_rounding=True)
        batched = msp.process_occupancies(occ, now_ms=0)

        for i, name in enumerate(names):
            fp = FrameProcessor(_cfg(1), replay_rounding=True)
            single = fp.process_occupancy(load_scenario(name), now_ms=0)
            assert batched[i].final_answer == single.final_answer, name
            assert len(batched[i].paths) == len(single.paths), name
            np.testing.assert_array_equal(batched[i].penalty, single.penalty)

    def test_exact_engine_batched_matches_reference_parity(self):
        """With engine="exact" the batched server plans per stream with the
        native A* (own angle cache per stream) — answers must equal the
        bit-parity single-stream results on EVERY fixture, including the one
        the wavefront diverges on (insane_case)."""
        names = scenario_names()
        cfg = replay_config().replace(num_streams=len(names))
        occ = np.stack([load_scenario(n) for n in names])
        msp = MultiStreamProcessor(cfg, replay_rounding=True)
        batched = msp.process_occupancies(occ, now_ms=0)
        for i, name in enumerate(names):
            fp = FrameProcessor(replay_config(), replay_rounding=True)
            single = fp.process_occupancy(load_scenario(name), now_ms=0)
            assert batched[i].final_answer == single.final_answer, name
            assert [[c.row, c.col] for p in batched[i].paths
                    for c in p.cells] == \
                   [[c.row, c.col] for p in single.paths
                    for c in p.cells], name

    def test_exact_device_batched_matches_goldens_13_of_13(self):
        """engine="exact_device" IS a batched mode: the on-chip exact A*
        (quirks included) vmaps over the stream axis with per-stream carried
        angle caches, so the batched server has 13/13 golden-answer parity —
        including insane_case, where the wavefront's Markovian cost model
        provably cannot match the reference's whole-path stateful angle
        charges (VERDICT r2 #5: 'make exact_device the batched mode').
        Reference: PathFinder.py:51-101, :119-186."""
        import dataclasses

        names = scenario_names()
        cfg = replay_config()
        cfg = cfg.replace(
            num_streams=len(names),
            pathfinder=dataclasses.replace(cfg.pathfinder,
                                           engine="exact_device"))
        occ = np.stack([load_scenario(n) for n in names])
        msp = MultiStreamProcessor(cfg, replay_rounding=True)
        batched = msp.process_occupancies(occ, now_ms=0)
        for i, name in enumerate(names):
            fp = FrameProcessor(replay_config(), replay_rounding=True)
            single = fp.process_occupancy(load_scenario(name), now_ms=0)
            assert batched[i].final_answer == single.final_answer, name
            assert [[c.row, c.col] for p in batched[i].paths
                    for c in p.cells] == \
                   [[c.row, c.col] for p in single.paths
                    for c in p.cells], name

    def test_per_stream_memory_is_independent(self):
        occ = np.stack([load_scenario("sharp_right_on_path"),
                        load_scenario("left_turn")])
        msp = MultiStreamProcessor(_cfg(2), replay_rounding=True)
        msp.process_occupancies(occ, now_ms=0)
        msp.process_occupancies(occ, now_ms=400)
        assert len(msp.analysers[0].previous_instructions) == 2
        assert len(msp.analysers[1].previous_instructions) == 2
        assert msp.analysers[0].previous_instructions is not \
            msp.analysers[1].previous_instructions

    def test_sharded_over_8_device_mesh(self):
        from vision_assist_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(8, mdl=1)
        names = (scenario_names() + scenario_names())[:8]
        occ = np.stack([load_scenario(n) for n in names])
        msp = MultiStreamProcessor(_cfg(8), mesh=mesh, replay_rounding=True)
        results = msp.process_occupancies(occ, now_ms=0)
        assert len(results) == 8
        # Cross-check stream 0 against the single-stream pipeline.
        fp = FrameProcessor(_cfg(1), replay_rounding=True)
        single = fp.process_occupancy(occ[0], now_ms=0)
        assert results[0].final_answer == single.final_answer

    def test_batched_segmentation_chain(self):
        from vision_assist_tpu.config import ModelConfig
        from vision_assist_tpu.models.inference import Segmenter

        cfg = _cfg(2).replace(frame_height=320, frame_width=240,
                              model=ModelConfig(imgsz=256))
        seg = Segmenter(cfg.model, example_hw=(320, 240),
                        grid_size=cfg.grid.grid_size)
        msp = MultiStreamProcessor(cfg, segmenter=seg, replay_rounding=True)
        frames = np.random.default_rng(0).integers(
            0, 255, (2, 320, 240, 3), dtype=np.uint8)
        results = msp.process_frames(frames, now_ms=0)
        assert len(results) == 2
        for r in results:
            assert r.final_answer in (
                "move_left", "move_right", "continue_forward")

    def test_fused_frames_sharded_over_8_device_mesh(self):
        """The FUSED full-frame path (seg + plan in one batched program,
        one packed transfer) dp-sharded over the virtual mesh — the product
        serving configuration (BASELINE config 5)."""
        from vision_assist_tpu.config import ModelConfig
        from vision_assist_tpu.models.inference import Segmenter
        from vision_assist_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(8, mdl=1)
        # f32 model: with a random-init bf16 net every occupancy logit sits
        # within one bf16 ulp of the threshold, so vmapped-vs-single fusion
        # differences flip cells and the equality below would test rounding
        # coincidences, not the serving contract (the golden generators run
        # f32 for the same reason).
        cfg = _cfg(8).replace(frame_height=320, frame_width=240,
                              model=ModelConfig(imgsz=64, dtype="float32"))
        seg = Segmenter(cfg.model, example_hw=(320, 240),
                        grid_size=cfg.grid.grid_size)
        msp = MultiStreamProcessor(cfg, segmenter=seg, mesh=mesh,
                                   replay_rounding=True)
        # Structured scenes (dark ground + bright band at per-stream
        # offsets), NOT uniform noise: a random-init model on noise puts
        # every occupancy logit at the threshold, so the bit-equality
        # assertion below would test bf16 rounding coincidences between
        # the vmapped and single-frame programs instead of the serving
        # contract. Decisive scenes keep the contract meaningful and
        # robust to +-1ulp fusion differences.
        frames = np.full((8, 320, 240, 3), 30, np.uint8)
        for i in range(8):
            frames[i, 60 + 10 * i:310, 40 + 15 * i:140 + 15 * i] = 180
        results = msp.process_frames(frames, now_ms=0)
        assert len(results) == 8
        # Per-stream equality with the unsharded single-frame fused path.
        fp = FrameProcessor(cfg.replace(num_streams=1), segmenter=seg,
                            replay_rounding=True)
        single = fp(frames[0], now_ms=0)
        assert results[0].final_answer == single.final_answer
        np.testing.assert_array_equal(results[0].walkable, single.walkable)
