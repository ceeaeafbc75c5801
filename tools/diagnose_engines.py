#!/usr/bin/env python
"""Measure serving latency/throughput of ALL three pathfinding engines on the
real chip, so the shipped default is a measured choice (VERDICT r2 #4: either
make an on-chip engine the default or publish the exact_device number that
justifies the C++ hybrid).

Per engine (exact = host C++ hybrid, exact_device = on-chip exact A*,
wavefront = on-chip batched relaxation):
  * sync p50/p90 per frame through the fused program (dispatch+chip+fetch);
  * pipelined ms/frame at depth 4 (submit/retire, the serving number);
  * 8-stream batched ms/frame (MultiStreamProcessor.process_frames).

Writes diagnostics/engine_latency.json (chip_quiet-stamped). Run on a quiet
chip: python tools/diagnose_engines.py
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_SYNC = 20
N_PIPE = 40
DEPTH = 4
STREAMS = 8
REPS_BATCHED = 10


def main() -> int:
    from vision_assist_tpu.utils.cache import enable as enable_cache
    enable_cache()

    import jax

    from vision_assist_tpu.config import ModelConfig, PipelineConfig
    from vision_assist_tpu.models.inference import Segmenter
    from vision_assist_tpu.pipeline.frame_processor import FrameProcessor
    from vision_assist_tpu.pipeline.multi_stream import MultiStreamProcessor

    sys.path.insert(0, str(REPO))
    from bench import WEIGHTS, load_frames

    variables = None
    if WEIGHTS.exists():
        from vision_assist_tpu.models.checkpoint import load_variables
        variables = load_variables(WEIGHTS)

    frames = load_frames(16, (640, 640))
    out = {"device": str(jax.devices()[0]),
           "weights": "trained" if variables is not None else "random-init"}

    seg = Segmenter(ModelConfig(imgsz=640), variables=variables,
                    example_hw=(640, 640), grid_size=20)

    for engine in ("exact", "exact_device", "wavefront"):
        cfg = PipelineConfig(frame_height=640, frame_width=640)
        cfg = cfg.replace(pathfinder=dataclasses.replace(
            cfg.pathfinder, engine=engine))
        fp = FrameProcessor(cfg, segmenter=seg)
        t0 = time.perf_counter()
        fp(frames[0], now_ms=0)
        compile_s = time.perf_counter() - t0
        fp(frames[1], now_ms=33)

        lat = []
        for i in range(N_SYNC):
            t0 = time.perf_counter()
            fp(frames[i % len(frames)], now_ms=1000 + i * 33)
            lat.append((time.perf_counter() - t0) * 1000)

        handles = []
        t0 = time.perf_counter()
        for i in range(N_PIPE):
            handles.append(fp.submit_frame(frames[i % len(frames)]))
            if len(handles) >= DEPTH:
                fp.retire_frame(handles.pop(0), now_ms=3000 + i * 33)
        while handles:
            fp.retire_frame(handles.pop(0), now_ms=6000)
        pipelined_ms = (time.perf_counter() - t0) * 1000 / N_PIPE

        msp = MultiStreamProcessor(cfg.replace(num_streams=STREAMS),
                                   segmenter=seg)
        sframes = frames[:STREAMS]
        t0 = time.perf_counter()
        msp.process_frames(sframes, now_ms=0)
        batched_compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for rep in range(REPS_BATCHED):
            msp.process_frames(sframes, now_ms=7000 + rep * 33)
        batched_ms = ((time.perf_counter() - t0) * 1000
                      / (REPS_BATCHED * STREAMS))
        msp.close()

        out[engine] = {
            "compile_s": round(compile_s, 2),
            "sync_p50_ms": round(float(np.percentile(lat, 50)), 3),
            "sync_p90_ms": round(float(np.percentile(lat, 90)), 3),
            "pipelined_depth4_ms_per_frame": round(pipelined_ms, 3),
            "batched8_compile_s": round(batched_compile_s, 2),
            "batched8_ms_per_frame": round(batched_ms, 3),
        }
        print(engine, json.dumps(out[engine]), flush=True)

    from vision_assist_tpu.utils.chipquiet import chip_quiet_status
    out.update(chip_quiet_status())
    path = REPO / "diagnostics" / "engine_latency.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
