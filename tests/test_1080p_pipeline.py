"""BASELINE config 4: a 1080p stream with PathVisualiser overlays and TTS
guidance cues. The lattice geometry just scales (54x96 cells at grid 20);
nothing in the pipeline is hardcoded to 720p/640.

Model-bypassed (process_occupancy) so the test is CPU-cheap; the model side
is resolution-parameterised the same way (Segmenter example_hw) and covered
at 640/320 elsewhere.
"""

import numpy as np

from vision_assist_tpu.config import PipelineConfig
from vision_assist_tpu.pipeline.frame_processor import FrameProcessor
from vision_assist_tpu.types import FinalAnswer


def _occupancy_1080p() -> np.ndarray:
    """A walkable corridor veering right on the 54x96 cell lattice."""
    occ = np.zeros((54, 96), bool)
    occ[20:54, 40:56] = True      # corridor up from the bottom centre
    occ[20:30, 40:76] = True      # right branch near the top
    return occ


def test_1080p_overlay_and_answer(tmp_path):
    cfg = PipelineConfig(frame_height=1080, frame_width=1920)
    assert (cfg.lattice_rows, cfg.lattice_cols) == (54, 96)
    fp = FrameProcessor(cfg, debug=True)
    res = fp.process_occupancy(_occupancy_1080p(), now_ms=0)
    assert res.final_answer in {a.value for a in FinalAnswer} | {""}
    assert res.paths, "expected at least one path on the corridor lattice"
    assert res.overlay is not None and res.overlay.shape == (1080, 1920, 3)
    # The overlay actually painted path cells (not a blank canvas).
    assert res.overlay.any()
    assert res.walkable.shape == (54, 96)


def test_tts_cue_assets(tmp_path):
    from vision_assist_tpu.io.tts import SAMPLE_RATE, generate_cue_assets

    paths = generate_cue_assets(tmp_path)
    assert set(paths) == {a.value for a in FinalAnswer}
    for p in paths.values():
        assert p.exists() and p.stat().st_size > 1000

    # A pluggable speech backend replaces the earcons (the reference renders
    # Coqui TTS mp3s offline, testing/tts/using_tts.py:8-13).
    calls = []

    def backend(text):
        calls.append(text)
        return np.zeros(SAMPLE_RATE // 2, np.float32), SAMPLE_RATE

    generate_cue_assets(tmp_path, speech_backend=backend)
    assert len(calls) == len(FinalAnswer)
