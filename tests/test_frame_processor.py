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


class TestExactDeviceEngine:
    """engine="exact_device" runs the reference's exact A* fully ON-CHIP
    (planning/device_astar.py) — 13/13 scenario parity through the public
    API, including insane_case (which the Markovian wavefront cannot match)."""

    @pytest.mark.parametrize("name", scenario_names())
    def test_matches_golden(self, name):
        fp = FrameProcessor(_replay_cfg("exact_device"), replay_rounding=True)
        res = fp.process_occupancy(load_scenario(name), now_ms=0)
        gold = json.loads((GOLDENS / f"{name}.json").read_text())

        assert res.final_answer == gold["final_answer"], name
        assert len(res.paths) == len(gold["paths"])
        for p, gp in zip(res.paths, gold["paths"]):
            assert [[c.row, c.col] for c in p.cells] == gp["cells_rc"], name

    def test_cache_state_carries_across_frames(self):
        fp = FrameProcessor(_replay_cfg("exact_device"), replay_rounding=True)
        occ = load_scenario("right_turn")
        import numpy as _np
        cache0 = _np.asarray(fp._astar_cache)
        fp.process_occupancy(occ, now_ms=0)
        cache1 = _np.asarray(fp._astar_cache)
        # the first frame warms the cache; a fresh cache is all-NaN
        assert _np.isnan(cache0).all()
        assert _np.isfinite(cache1).any()


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


class TestFusedFrameProgram:
    """The fused one-program/one-transfer path (pipeline/frame_program.py)
    must produce the same results as the two-program path (Segmenter then
    process_occupancy) for both engines."""

    @pytest.fixture(scope="class")
    def seg_and_frame(self):
        from vision_assist_tpu.config import ModelConfig
        from vision_assist_tpu.models.inference import Segmenter

        seg = Segmenter(ModelConfig(imgsz=64), example_hw=(320, 240))
        frame = np.full((320, 240, 3), 30, np.uint8)
        frame[60:310, 80:160] = 180
        return seg, frame

    @staticmethod
    def _cfg(engine):
        cfg = PipelineConfig(frame_height=320, frame_width=240)
        return cfg.replace(
            pathfinder=cfg.pathfinder.__class__(engine=engine))

    @pytest.mark.parametrize("engine", ["exact", "wavefront", "exact_device"])
    def test_fused_matches_two_program_path(self, seg_and_frame, engine):
        seg, frame = seg_and_frame
        cfg = self._cfg(engine)

        fp_fused = FrameProcessor(cfg, segmenter=seg)
        res_fused = fp_fused(frame, now_ms=0)

        fp_ref = FrameProcessor(cfg, segmenter=seg)
        occ = np.asarray(seg(frame).occupancy)
        res_ref = fp_ref.process_occupancy(occ, now_ms=0)

        assert res_fused.final_answer == res_ref.final_answer
        np.testing.assert_array_equal(res_fused.occupancy, res_ref.occupancy)
        np.testing.assert_array_equal(res_fused.walkable, res_ref.walkable)
        np.testing.assert_array_equal(res_fused.artificial,
                                      res_ref.artificial)
        assert [(p.centre.x, p.centre.y, p.orientation)
                for p in res_fused.peaks] == \
               [(p.centre.x, p.centre.y, p.orientation)
                for p in res_ref.peaks]
        assert len(res_fused.paths) == len(res_ref.paths)
        for a, b in zip(res_fused.paths, res_ref.paths):
            assert [(c.row, c.col) for c in a.cells] == \
                   [(c.row, c.col) for c in b.cells]
        if engine != "exact":
            # Both report the device f32 penalty field.
            np.testing.assert_allclose(res_fused.penalty, res_ref.penalty,
                                       rtol=1e-6)

    def test_submit_retire_pipelining(self, seg_and_frame):
        seg, frame = seg_and_frame
        fp = FrameProcessor(self._cfg("exact"), segmenter=seg)
        handles = [fp.submit_frame(frame) for _ in range(3)]
        answers = [fp.retire_frame(h, now_ms=i * 500).final_answer
                   for i, h in enumerate(handles)]
        assert all(a in ("move_left", "move_right", "continue_forward")
                   for a in answers)

    def test_blur_gate_via_payload(self, seg_and_frame):
        from vision_assist_tpu.config import BlurConfig

        seg, frame = seg_and_frame
        cfg = self._cfg("exact").replace(
            blur=BlurConfig(enabled=True, laplacian_var_threshold=1e9))
        fp = FrameProcessor(cfg, segmenter=seg)
        assert fp(frame, now_ms=0) is None  # everything is "blurry"

    def test_blur_rejected_frame_leaves_device_cache_untouched(
            self, seg_and_frame):
        """Reference parity: a blur-rejected frame never reaches planning
        (FrameProcessor.py:44-48), so the PathFinder's cross-frame angle
        cache must not change — including in exact_device mode where the
        cache lives on-chip and is threaded through the fused program."""
        from vision_assist_tpu.config import BlurConfig

        seg, frame = seg_and_frame
        base = self._cfg("exact_device")

        cfg = base.replace(
            blur=BlurConfig(enabled=True, laplacian_var_threshold=1e9))
        fp = FrameProcessor(cfg, segmenter=seg)
        before = np.asarray(fp._astar_cache).copy()
        assert fp(frame, now_ms=0) is None
        np.testing.assert_array_equal(np.asarray(fp._astar_cache), before)

        # Control: an accepted frame does mutate the cache.
        cfg2 = base.replace(
            blur=BlurConfig(enabled=True, laplacian_var_threshold=0.0))
        fp2 = FrameProcessor(cfg2, segmenter=seg)
        assert fp2(frame, now_ms=0) is not None
        assert not np.array_equal(np.asarray(fp2._astar_cache), before,
                                  equal_nan=True)

    def test_i420_odd_dims_rejected_at_construction(self):
        cfg = PipelineConfig(frame_height=321, frame_width=240,
                             transfer_format="i420")
        with pytest.raises(ValueError, match="even"):
            FrameProcessor(cfg)


class TestDeviceP50ScanRunner:
    """tools/diagnose_device_p50.py measures ONE scan over K frames; its
    payloads must match per-frame device_fn calls (a wrapper bug discovered
    on the chip costs an hour of relay compiles). Matching is semantic, not
    bitwise: the scan body is a different XLA compilation, and bf16
    reduction reassociation shifts best_conf by ~1 ULP, which can flip a
    single threshold-sitting lattice cell — measured on CPU: <=1 int of 243
    per frame. A wrapper bug (wrong frame indexing, broken cache carry)
    would diverge massively; the bound stays tight."""

    @pytest.mark.parametrize("engine", ["exact", "exact_device"])
    def test_scan_payloads_match_per_frame(self, engine):
        import sys
        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))
        import jax.numpy as jnp
        from diagnose_device_p50 import make_scan_runner

        from vision_assist_tpu.config import ModelConfig
        from vision_assist_tpu.models.inference import Segmenter
        from vision_assist_tpu.ops.yuv import bgr_to_i420_host
        from vision_assist_tpu.pipeline.frame_program import make_frame_program

        seg = Segmenter(ModelConfig(imgsz=64), example_hw=(320, 240))
        cfg = PipelineConfig(frame_height=320, frame_width=240,
                             transfer_format="i420")
        cfg = cfg.replace(pathfinder=cfg.pathfinder.__class__(engine=engine))
        device_fn, _ = make_frame_program(cfg, seg)

        rng = np.random.default_rng(0)
        frames = np.stack([
            np.where(rng.random((320, 240, 3)) > 0.5, 180, 30).astype(np.uint8)
            for _ in range(3)])
        planes = jnp.asarray(np.stack([bgr_to_i420_host(f) for f in frames]))

        exact_device = engine == "exact_device"
        run_k = make_scan_runner(device_fn, exact_device)
        if exact_device:
            from vision_assist_tpu.planning.device_astar import empty_cache
            scanned, _ = run_k(seg.variables, planes, empty_cache())
            cache = empty_cache()
            singles = []
            for i in range(3):
                p, cache = device_fn(seg.variables, planes[i], cache)
                singles.append(p)
        else:
            scanned = run_k(seg.variables, planes)
            singles = [device_fn(seg.variables, planes[i]) for i in range(3)]
        for i in range(3):
            a = np.asarray(scanned[i])
            b = np.asarray(singles[i])
            n_diff = int((a != b).sum())
            assert n_diff <= max(3, a.size // 50), (
                f"frame {i}: {n_diff}/{a.size} payload ints differ — "
                "beyond compilation-variance scale; wrapper bug")
