"""Tests for IO/tooling: TTS cue assets, stage timer, scenario editor
headless modes, visualiser colours."""

from __future__ import annotations

import pathlib
import subprocess
import sys
import wave

import numpy as np

from vision_assist_tpu.io.tts import generate_cue_assets, render_cue
from vision_assist_tpu.io.visualiser import penalty_colour
from vision_assist_tpu.types import FinalAnswer
from vision_assist_tpu.utils.profiling import StageTimer

REPO = pathlib.Path(__file__).resolve().parents[1]


class TestTTS:
    def test_generates_three_assets(self, tmp_path):
        # Default backend: the offline formant synthesizer (mono speech).
        paths = generate_cue_assets(tmp_path)
        assert set(paths) == {"move_left", "move_right", "continue_forward"}
        for p in paths.values():
            with wave.open(str(p)) as w:
                assert w.getnchannels() == 1
                assert w.getnframes() > 1000

    def test_earcon_backend_generates_stereo(self, tmp_path):
        paths = generate_cue_assets(tmp_path, speech_backend="earcon")
        for p in paths.values():
            with wave.open(str(p)) as w:
                assert w.getnchannels() == 2
                assert w.getnframes() > 1000

    def test_cues_are_distinct_and_panned(self):
        left = render_cue(FinalAnswer.MOVE_LEFT)
        right = render_cue(FinalAnswer.MOVE_RIGHT)
        fwd = render_cue(FinalAnswer.CONTINUE_FORWARD)
        # left cue louder on left channel; right cue louder on right
        assert np.abs(left[:, 0]).sum() > np.abs(left[:, 1]).sum()
        assert np.abs(right[:, 1]).sum() > np.abs(right[:, 0]).sum()
        assert not np.allclose(left[: len(fwd)], fwd[: len(left)])


class TestStageTimer:
    def test_accumulates_and_formats(self, tmp_path):
        t = StageTimer()
        for _ in range(3):
            with t.stage("yolo"):
                pass
            with t.stage("path_finding"):
                pass
            t.end_frame()
        s = t.summary()
        assert s["yolo"]["n"] == 3
        out = tmp_path / "timing_data.txt"
        t.write(out)
        text = out.read_text()
        assert "path_finding:" in text and "Avg:" in text and "Max:" in text

    def test_samples_json_and_boxplot_tool(self, tmp_path):
        import json
        import os

        t = StageTimer()
        for _ in range(4):
            with t.stage("penalty_calculations"):
                pass
            with t.stage("path_finding"):
                pass
            t.end_frame()
        samples = tmp_path / "samples.json"
        timing = tmp_path / "timing_data.txt"
        t.write_samples(samples)
        t.write(timing)
        assert len(json.loads(samples.read_text())["path_finding"]) == 4

        out = tmp_path / "plot.png"
        repo = pathlib.Path(__file__).resolve().parents[1]
        r = subprocess.run(
            [sys.executable, str(repo / "tools" / "plot_timing.py"),
             str(samples), str(timing), "-o", str(out)],
            capture_output=True, text=True,
            env={**os.environ, "PALLAS_AXON_POOL_IPS": ""})
        assert r.returncode == 0, r.stderr
        assert out.exists() and out.stat().st_size > 0

    def test_load_run_accepts_reference_average_key(self, tmp_path):
        """The reference's archived timing_data.txt files write 'Average:'
        (FrameProcessor_with_time_saving.py:404-416); ours write 'Avg:'.
        Both must parse with the box centred on the average, not 0."""
        import importlib.util

        repo = pathlib.Path(__file__).resolve().parents[1]
        spec = importlib.util.spec_from_file_location(
            "plot_timing", repo / "tools" / "plot_timing.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        ref_style = tmp_path / "timing_data.txt"
        ref_style.write_text(
            "Timing Data (nanoseconds)\n=======================\n\n"
            "yolo_prediction:\n  Average: 0.04\n  Last: 0.0625\n"
            "  Min: 0.03125\n  Max: 0.0625\n")
        run = mod.load_run(ref_style)
        assert run["yolo_prediction"] == [0.03125, 0.04, 0.04, 0.04, 0.0625]

    def test_outlier_frames_dropped(self):
        import time as _time

        t = StageTimer(outlier_threshold_s=0.01)
        with t.stage("slow"):
            _time.sleep(0.02)
        t.end_frame()
        with t.stage("slow"):
            pass
        t.end_frame()
        assert t.summary()["slow"]["n"] == 1


class TestScenarioEditorHeadless:
    def test_from_ascii(self, tmp_path):
        layout = tmp_path / "layout.txt"
        layout.write_text("..##..\n..##..\n..##..\n")
        r = subprocess.run(
            [sys.executable, str(REPO / "tools" / "scenario_editor.py"),
             "asciicase", "--from-ascii", str(layout), "--out", str(tmp_path)],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        occ = np.load(tmp_path / "asciicase_grids.npy")
        assert occ.shape == (3, 6)
        assert occ.sum() == 6

    def test_from_image(self, tmp_path):
        import cv2

        img = np.zeros((128, 72), np.uint8)
        img[64:, :] = 255
        path = tmp_path / "mask.png"
        cv2.imwrite(str(path), img)
        r = subprocess.run(
            [sys.executable, str(REPO / "tools" / "scenario_editor.py"),
             "imgcase", "--from-image", str(path), "--rows", "64",
             "--cols", "36", "--out", str(tmp_path)],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        occ = np.load(tmp_path / "imgcase_grids.npy")
        assert occ.shape == (64, 36)
        assert occ[40:].all() and not occ[:30].any()


class TestVisualiser:
    def test_penalty_colour_lookup(self):
        assert penalty_colour(0.0) == (0, 255, 15)
        assert penalty_colour(1.0) == (0, 0, 255)
        assert penalty_colour(0.48) == (0, 163, 249)  # nearest stop 0.5


class TestWireDiagnostic:
    """tools/diagnose_wire.py::measure — on a local backend there is no
    relay wire, so fresh-vs-resident consumption must land in the
    below-noise branch (wire fields None) while the staging rate and the
    dispatch floor stay populated. The chip branch is exercised by the
    relay watcher (diagnostics/wire_ceiling.json)."""

    def test_measure_local_backend_reports_no_wire(self):
        sys.path.insert(0, str(REPO / "tools"))
        from diagnose_wire import measure

        m = measure((2, 96, 64), trials=4)
        assert m["batch_mb"] == round(2 * 96 * 64 / 1e6, 3)
        assert m["trials"] == 4
        assert m["staging_mb_per_s"] > 0
        assert m["resident_floor_ms"] >= 0
        # local device_put is a memcpy: no measurable wire
        assert m["wire_ms_per_batch"] is None
        assert m["wire_mb_per_s"] is None
