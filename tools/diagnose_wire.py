#!/usr/bin/env python
"""The relay's REAL wire model (supersedes diagnose_h2d's interpretation).

Round-3b microbenchmarking showed `device_put` "completion" is relay-client
staging: the bytes cross the wire when an *execution consumes* the buffer,
serial with the execute, so the serving question is "ms per consumed
upload", not "device_put latency". This tool measures, on a quiet chip:

  1. fused frame program drained-pipeline rate with (a) device-resident
     input, (b) fresh BGR upload per frame, (c) fresh I420 upload per frame
     (the serving transfer format, ops/yuv.py);
  2. the lone blocking payload fetch stall vs copy_to_host_async-at-submit
     (what FrameProcessor.submit_frame does);
  3. sync-latency "hurry" probe: does blocking on a trivial execute after
     the submit deliver the payload earlier than blocking on the payload
     fetch itself (relay flush piggyback)?

Writes diagnostics/wire_model.json.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def drained_rate(submit, n=40):
    t0 = time.perf_counter()
    hs = [submit(i) for i in range(n)]
    import jax
    jax.block_until_ready(hs[-1])
    return (time.perf_counter() - t0) / n * 1e3


def main() -> int:
    from vision_assist_tpu.utils.cache import enable as enable_cache
    enable_cache()
    import jax

    import bench
    from vision_assist_tpu.config import ModelConfig, PipelineConfig
    from vision_assist_tpu.models.checkpoint import load_variables
    from vision_assist_tpu.models.inference import Segmenter
    from vision_assist_tpu.ops.yuv import bgr_to_i420_host
    from vision_assist_tpu.pipeline.frame_processor import FrameProcessor
    from vision_assist_tpu.utils.chipquiet import chip_quiet_status

    out = {"device": str(jax.devices()[0])}
    frames = bench.load_frames(16, (640, 640))
    weights = REPO / "assets/weights/v8n_640_best.msgpack"
    variables = load_variables(weights) if weights.exists() else None

    def build(fmt):
        cfg = PipelineConfig(frame_height=640, frame_width=640,
                             transfer_format=fmt)
        seg = Segmenter(ModelConfig(imgsz=640), variables=variables,
                        example_hw=(640, 640), grid_size=cfg.grid.grid_size)
        fp = FrameProcessor(cfg, segmenter=seg)
        for i in range(2):
            fp(frames[i], now_ms=i * 33)
        return fp

    # 1. consumed-upload rates.
    fp_bgr = build("bgr")
    fds = [jax.device_put(frames[i]) for i in range(16)]
    jax.block_until_ready(fds)
    out["fused_resident_ms_per_frame"] = drained_rate(
        lambda i: fp_bgr._fused(fp_bgr.segmenter.variables, fds[i % 16]))
    out["fused_fresh_bgr_ms_per_frame"] = drained_rate(
        lambda i: fp_bgr.submit_frame(frames[i % 16]))
    fp_i420 = build("i420")
    out["fused_fresh_i420_ms_per_frame"] = drained_rate(
        lambda i: fp_i420.submit_frame(frames[i % 16]))

    # 2. lone fetch stall vs async-at-submit.
    h = fp_bgr._fused(fp_bgr.segmenter.variables, fds[0])  # no async copy
    jax.block_until_ready(h)
    t0 = time.perf_counter()
    np.asarray(h)
    out["lone_fetch_ms"] = (time.perf_counter() - t0) * 1e3
    h = fp_bgr.submit_frame(frames[0])  # submit_frame enqueues the copy
    jax.block_until_ready(h)
    time.sleep(0.05)
    t0 = time.perf_counter()
    np.asarray(h)
    out["fetch_after_async_copy_ms"] = (time.perf_counter() - t0) * 1e3

    # 3. sync "hurry" probe: trivial blocking execute after submit.
    trivial = jax.jit(lambda x: x + 1.0)
    tx = jax.device_put(np.float32(0.0))
    jax.block_until_ready(trivial(tx))
    plain, hurried = [], []
    for i in range(12):
        t0 = time.perf_counter()
        h = fp_i420.submit_frame(frames[i % 16])
        np.asarray(h)
        plain.append(time.perf_counter() - t0)
    for i in range(12):
        t0 = time.perf_counter()
        h = fp_i420.submit_frame(frames[i % 16])
        jax.block_until_ready(trivial(tx))  # flush piggyback?
        np.asarray(h)
        hurried.append(time.perf_counter() - t0)
    out["sync_p50_ms"] = float(np.median(plain) * 1e3)
    out["sync_hurried_p50_ms"] = float(np.median(hurried) * 1e3)

    out.update(chip_quiet_status())
    path = REPO / "diagnostics" / "wire_model.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
