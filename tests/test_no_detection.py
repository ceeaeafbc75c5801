"""No-detection and blur-retry driver semantics (VERDICT r4 #7).

Product robustness: whatever the model's quality, the driver must do
something sane on frames that yield no guidance. Reference semantics:

* zero detections -> FrameProcessor short-circuits to empty instructions
  (`if not self.grids: return []`, FrameProcessor.py:327-332) and the
  driver simply moves on to the next sampled frame (main.py:125 prints
  `Instructions: []`); the analyser maps an empty instruction list to
  CONTINUE_FORWARD (PathAnalyser.py:291-292);
* a BLUR-gated frame is the one that retries the immediate next frame
  (main.py:78-94 while-loop).

bench.py reports `frames_with_detections` permanently so model promotions
are judged on guidance coverage, not just mAP (see PERFORMANCE.md).
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
cv2 = pytest.importorskip("cv2")

from vision_assist_tpu.config import ModelConfig, PipelineConfig
from vision_assist_tpu.models.inference import Segmenter
from vision_assist_tpu.pipeline.frame_processor import FrameProcessor


@pytest.fixture(scope="module")
def no_det_fp():
    """A FrameProcessor whose conf threshold no detection can clear
    (sigmoid scores are < 1.0), so every frame is a no-detection frame —
    deterministic regardless of the random-init model's output."""
    seg = Segmenter(ModelConfig(imgsz=64, conf_threshold=1.0),
                    example_hw=(320, 240))
    cfg = PipelineConfig(frame_height=320, frame_width=240)
    return FrameProcessor(cfg, segmenter=seg)


class TestNoDetectionFrame:
    def test_result_is_sane_not_none(self, no_det_fp):
        """A no-detection frame is NOT retried (that is the blur gate's
        semantics); it produces a well-formed result with zero paths."""
        frame = np.full((320, 240, 3), 30, np.uint8)
        frame[60:310, 80:160] = 180
        res = no_det_fp(frame, now_ms=0)
        assert res is not None
        assert res.n_detections == 0
        assert res.paths == []
        assert not res.occupancy.any()

    def test_empty_answer_matches_reference(self, no_det_fp):
        """The final answer on an empty frame equals what the reference's
        PathAnalyser produces for an empty path list (CONTINUE_FORWARD,
        PathAnalyser.py:291-292) — pinned against the enum value itself in
        test_reference_differential.py::TestEmptyPathsAnswer."""
        frame = np.zeros((320, 240, 3), np.uint8)
        res = no_det_fp(frame, now_ms=0)
        assert res.final_answer == "continue_forward"

    def test_sequence_keeps_streaming(self, no_det_fp):
        """A run of no-detection frames must not wedge the pipeline or
        leak state into a later detection-bearing frame's analyser
        timestamps: every frame yields a result."""
        for i in range(3):
            res = no_det_fp(np.zeros((320, 240, 3), np.uint8),
                            now_ms=i * 500)
            assert res is not None
            assert res.final_answer == "continue_forward"


class TestBlurRetryDriver:
    @pytest.fixture(scope="class")
    def clip(self, tmp_path_factory):
        """36 uniform (Laplacian var 0 => blur-gated) frames, then 24
        noisy high-variance frames. With --every-n 20 the driver samples
        frame 20 (blurry), retries forward to frame 37 (sharp), then
        samples 40 and 60 normally."""
        path = tmp_path_factory.mktemp("blurclip") / "clip.mp4"
        w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30,
                            (240, 320))
        assert w.isOpened()
        rng = np.random.RandomState(0)
        for t in range(60):
            if t < 36:
                frame = np.full((320, 240, 3), 60, np.uint8)
            else:
                frame = rng.randint(0, 255, (320, 240, 3)).astype(np.uint8)
            w.write(frame)
        w.release()
        return path

    def test_blur_gate_retries_next_frame(self, clip, tmp_path, capsys):
        """main.py:78-94 semantics: a blur-gated sample consumes
        consecutive frames until a sharp one arrives; gated frames are
        counted as skipped, sharp ones processed."""
        from vision_assist_tpu.main import main

        rc = main([
            "video", "--source", str(clip), "--every-n", "20",
            "--camera-fps", "10000", "--engine", "wavefront",
            "--blur-gate", "--output", str(tmp_path),
        ])
        assert rc == 0
        out = capsys.readouterr().out
        # Sample at 20 is uniform: the retry loop consumes frames 20..36
        # (17 gated skips) until frame 37 clears the gate, so the read
        # head advances and only one more sample (clip frame 57) fits in
        # the 60-frame clip: 2 processed, exactly like the reference's
        # while-loop (main.py:78-94) would behave on this clip.
        assert "frames processed: 2" in out
        assert "frames skipped (blur): 17" in out
