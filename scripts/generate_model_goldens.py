#!/usr/bin/env python
"""Pin model-in-the-loop goldens: full chain (letterbox -> YOLO trained
weights -> NMS -> occupancy -> plan -> answer) on real validation images.

Writes tests/fixtures/model_goldens.json with, per image: the final answer,
detection count, peak count and the walkable-cell count. The companion test
(tests/test_model_goldens.py) replays the chain with the committed weights
and asserts identical outputs — the bridge between the occupancy-level parity
suite and frame-level behaviour (VERDICT round 1, missing #5; reference
mechanism: run_on_main.py:147-201 inverted).

Run at finalize, AFTER the final checkpoint is promoted to assets/weights/.
Pin on CPU — the test suite replays on CPU, and bf16 matmul numerics differ
between the TPU MXU and the CPU emulation, so near-threshold detections
could flip across platforms:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/generate_model_goldens.py
"""

from __future__ import annotations

import hashlib
import json
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

WEIGHTS = REPO / "assets" / "weights" / "v8n_640_best.msgpack"
VAL_IMAGES = pathlib.Path("/root/reference/model/valid/images")
OUT = REPO / "tests" / "fixtures" / "model_goldens.json"
N_IMAGES = 12


def main() -> int:
    import cv2

    from vision_assist_tpu.utils.cache import enable as enable_cache
    enable_cache()

    from vision_assist_tpu.config import ModelConfig, PipelineConfig
    from vision_assist_tpu.models.checkpoint import load_variables
    from vision_assist_tpu.models.inference import Segmenter
    from vision_assist_tpu.pipeline.frame_processor import FrameProcessor

    if not WEIGHTS.exists():
        print(f"no weights at {WEIGHTS}; train first")
        return 1

    cfg = PipelineConfig(frame_height=640, frame_width=640)
    seg = Segmenter(ModelConfig(imgsz=640), variables=load_variables(WEIGHTS),
                    example_hw=(640, 640), grid_size=cfg.grid.grid_size)
    fp = FrameProcessor(cfg, segmenter=seg)

    records = {}
    paths = sorted(VAL_IMAGES.glob("*.jpg"))[:N_IMAGES]
    for p in paths:
        frame = cv2.imread(str(p))
        if frame.shape[:2] != (640, 640):
            frame = cv2.resize(frame, (640, 640))
        res = fp(frame, now_ms=0)
        fp.analyser.previous_instructions.clear()  # one-shot per image
        records[p.name] = {
            "final_answer": res.final_answer,
            "n_detections": int(res.n_detections),
            "n_peaks": len(res.peaks),
            "n_paths": len(res.paths),
            "walkable_cells": int(res.walkable.sum()),
        }
        print(p.name, records[p.name], flush=True)

    golden = {
        "weights_sha256": hashlib.sha256(WEIGHTS.read_bytes()).hexdigest(),
        "images": records,
    }
    OUT.write_text(json.dumps(golden, indent=1))
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
