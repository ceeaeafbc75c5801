#!/usr/bin/env python
"""End-to-end benchmark: frames/sec/chip (seg + pathfind) at 640x640.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N, ...}

Baseline: the reference pipeline runs ~0.24 s/frame (~4.2 FPS) after its own
optimisation passes (BASELINE.md, images/profiling_21_02/optimisation_3_*).

Measured per frame on one chip, with the DEFAULT engine (exact): letterbox
-> YOLOv8n-seg forward (bf16) -> NMS -> mask decode -> occupancy ->
artificial cells -> penalty field -> peaks (device), then native C++ A*
planning + path materialisation + sectioning + instruction synthesis (host).
The "engine" key in the output records which planner ran. Planning runs on a
real scenario lattice so the search workload is representative regardless of
the model weights. Uses the trained checkpoint in assets/weights/ when
present (random init otherwise — the compute cost is identical). Also
reports batched multi-stream segmentation throughput.
"""

from __future__ import annotations

import json
import pathlib
import time

import numpy as np

WEIGHTS = pathlib.Path(__file__).parent / "assets" / "weights" / "v8n_640_best.msgpack"


def main() -> None:
    import jax

    from vision_assist_tpu.utils.cache import enable as enable_cache
    enable_cache()

    import jax.numpy as jnp

    from vision_assist_tpu.config import ModelConfig, replay_config
    from vision_assist_tpu.io.scenarios import load_scenario
    from vision_assist_tpu.models.inference import Segmenter
    from vision_assist_tpu.pipeline.frame_processor import FrameProcessor

    device = jax.devices()[0]
    frame_h, frame_w = 1280, 720

    cfg = replay_config().replace(frame_height=frame_h, frame_width=frame_w)
    variables = None
    if WEIGHTS.exists():
        from vision_assist_tpu.models.checkpoint import load_variables
        variables = load_variables(WEIGHTS)
    seg = Segmenter(ModelConfig(imgsz=640), variables=variables,
                    example_hw=(frame_h, frame_w),
                    grid_size=cfg.grid.grid_size)
    fp = FrameProcessor(cfg, segmenter=seg, replay_rounding=True)

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (frame_h, frame_w, 3), dtype=np.uint8)
    occ = load_scenario("right_turn")

    def one_frame(now_ms: int) -> None:
        seg_res = seg(frame)                      # device: model chain
        np.asarray(seg_res.occupancy)             # sync like a real consumer
        fp.process_occupancy(occ, now_ms=now_ms)  # device plan + host semantics

    for i in range(3):  # warmup / compile
        one_frame(i)

    n = 30
    lat = []
    for i in range(n):
        t0 = time.perf_counter()
        one_frame(1000 + i * 33)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)
    fps = 1.0 / float(np.median(lat))

    # Batched multi-stream throughput: 4 streams per step (BASELINE config 5).
    streams = 4
    frames4 = jnp.asarray(np.stack([frame] * streams))
    chain = seg._frame_chain
    batched = jax.jit(lambda v, f: jax.vmap(lambda x: chain(v, x))(f))
    batched(seg.variables, frames4).occupancy.block_until_ready()
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        batched(seg.variables, frames4).occupancy.block_until_ready()
    batched_fps = streams * reps / (time.perf_counter() - t0)

    baseline_fps = 1.0 / 0.24  # BASELINE.md "optimisation 3" frame time
    print(json.dumps({
        "metric": "frames/sec/chip end-to-end (seg+pathfind) at 640x640",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / baseline_fps, 2),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1000, 2),
        "p90_ms": round(float(np.percentile(lat, 90)) * 1000, 2),
        "batched_seg_fps_4streams": round(batched_fps, 2),
        "weights": "trained" if WEIGHTS.exists() else "random-init",
        "engine": cfg.pathfinder.engine,
        "device": str(device),
        "frames": n,
    }))


if __name__ == "__main__":
    main()
