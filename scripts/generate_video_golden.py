#!/usr/bin/env python
"""Pin a multi-frame VIDEO golden with the trained checkpoint.

BASELINE config 2's frame-for-frame spirit (reference: main.py:62-128 — the
video driver feeds consecutive frames through one FrameProcessor whose
analyser carries instruction memory across frames): a fixed sequence of real
validation photos plays as a pseudo-clip through ONE FrameProcessor at
30 FPS timestamps (now_ms = i * 333), WITHOUT clearing the analyser between
frames, so the pinned answers include the temporal-memory effects
(escalation/suppression windows, semantics/analyser.py::_enrich_with_memory)
that the one-shot model goldens deliberately exclude.

Writes tests/fixtures/video_golden.json; tests/test_video_golden.py replays
the same sequence on CPU and asserts identical per-frame outputs.

Run at finalize, AFTER checkpoint promotion, on CPU (the suite replays on
CPU; bf16 MXU-vs-CPU numerics could flip near-threshold detections):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/generate_video_golden.py
"""

from __future__ import annotations

import hashlib
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

WEIGHTS = REPO / "assets" / "weights" / "v8n_640_best.msgpack"
VAL_IMAGES = pathlib.Path("/root/reference/model/valid/images")
OUT = REPO / "tests" / "fixtures" / "video_golden.json"
N_FRAMES = 16
FRAME_MS = 333  # ~30 FPS


def run_sequence(frame_paths, weights_path):
    """Drive the frames through one FrameProcessor; returns per-frame dicts.

    Shared by the generator and the replay test so the pinned protocol can
    never drift from the checked one.
    """
    import cv2

    from vision_assist_tpu.config import ModelConfig, PipelineConfig
    from vision_assist_tpu.models.checkpoint import load_variables
    from vision_assist_tpu.models.inference import Segmenter
    from vision_assist_tpu.pipeline.frame_processor import FrameProcessor

    cfg = PipelineConfig(frame_height=640, frame_width=640)
    seg = Segmenter(ModelConfig(imgsz=640),
                    variables=load_variables(weights_path),
                    example_hw=(640, 640), grid_size=cfg.grid.grid_size)
    fp = FrameProcessor(cfg, segmenter=seg)

    frames = []
    for i, p in enumerate(frame_paths):
        frame = cv2.imread(str(p))
        if frame.shape[:2] != (640, 640):
            frame = cv2.resize(frame, (640, 640))
        res = fp(frame, now_ms=i * FRAME_MS)  # memory carries across frames
        frames.append({
            "image": p.name,
            "now_ms": i * FRAME_MS,
            "final_answer": res.final_answer,
            "n_detections": int(res.n_detections),
            "n_paths": len(res.paths),
            "memory_timestamps": len(fp.analyser.previous_instructions),
        })
    return frames


def main() -> int:
    from vision_assist_tpu.utils.cache import enable as enable_cache
    enable_cache()

    if not WEIGHTS.exists():
        print(f"no weights at {WEIGHTS}; train first")
        return 1

    paths = sorted(VAL_IMAGES.glob("*.jpg"))[:N_FRAMES]
    frames = run_sequence(paths, WEIGHTS)
    for f in frames:
        print(f, flush=True)

    OUT.write_text(json.dumps({
        "weights_sha256": hashlib.sha256(WEIGHTS.read_bytes()).hexdigest(),
        "frame_ms": FRAME_MS,
        "frames": frames,
    }, indent=1))
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
