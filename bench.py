#!/usr/bin/env python
"""End-to-end benchmark: frames/sec/chip (seg + pathfind) at 640x640.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N, ...}

Baseline: the reference pipeline runs ~0.24 s/frame (~4.2 FPS) after its own
optimisation passes (BASELINE.md, images/profiling_21_02/optimisation_3_*).

The measured step is the full per-frame work on one chip:
  letterbox -> YOLOv8n-seg forward (bf16) -> NMS -> mask decode -> occupancy
  -> artificial cells -> penalty field -> peaks -> wavefront pathfinding
  (device), then path materialisation + sectioning + instruction synthesis
  (host). Planning runs on a real scenario lattice so the wavefront iteration
  count is representative, independent of the (random) model weights.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    from vision_assist_tpu.utils.cache import enable as enable_cache
    enable_cache()

    from vision_assist_tpu.config import ModelConfig, replay_config
    from vision_assist_tpu.io.scenarios import load_scenario
    from vision_assist_tpu.models.inference import Segmenter
    from vision_assist_tpu.pipeline.frame_processor import FrameProcessor

    device = jax.devices()[0]
    frame_h, frame_w = 1280, 720

    cfg = replay_config().replace(frame_height=frame_h, frame_width=frame_w)
    seg = Segmenter(ModelConfig(imgsz=640), example_hw=(frame_h, frame_w),
                    grid_size=cfg.grid.grid_size)
    fp = FrameProcessor(cfg, segmenter=seg, replay_rounding=True)

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (frame_h, frame_w, 3), dtype=np.uint8)
    occ = load_scenario("right_turn")

    def one_frame(now_ms: int) -> None:
        seg_res = seg(frame)                      # device: model chain
        np.asarray(seg_res.occupancy)             # sync like a real consumer
        fp.process_occupancy(occ, now_ms=now_ms)  # device plan + host semantics

    # Warmup / compile.
    for i in range(3):
        one_frame(i)

    n = 30
    lat = []
    for i in range(n):
        t0 = time.perf_counter()
        one_frame(1000 + i * 33)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)

    fps = 1.0 / float(np.median(lat))
    baseline_fps = 1.0 / 0.24  # BASELINE.md "optimisation 3" frame time
    print(json.dumps({
        "metric": "frames/sec/chip end-to-end (seg+pathfind) at 640x640",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / baseline_fps, 2),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1000, 2),
        "p90_ms": round(float(np.percentile(lat, 90)) * 1000, 2),
        "device": str(device),
        "frames": n,
    }))


if __name__ == "__main__":
    main()
