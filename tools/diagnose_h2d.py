#!/usr/bin/env python
"""Probe the host->device frame transfer: is it async, does it overlap, and
does a prefetch thread pool buy throughput?

BENCH_LOCAL r3 showed the fused frame program pipelines at ~4.8 ms/frame with
device-resident input but ~24 ms/frame when fed numpy frames — i.e. the h2d
transfer of the 1.2 MB uint8 frame serialises with compute on the relay.
This tool measures, on a quiet chip:
  1. device_put dispatch time (no block) vs completed-transfer time;
  2. aggregate transfer throughput with 1/2/4 concurrent device_put threads;
  3. the fused program fed by an N-deep device_put prefetch queue (the
     proposed production fix) vs feeding numpy directly.

Writes diagnostics/h2d_overlap.json.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    from vision_assist_tpu.utils.cache import enable as enable_cache
    enable_cache()
    import jax

    from vision_assist_tpu.utils.chipquiet import chip_quiet_status

    dev = jax.devices()[0]
    out = {"device": str(dev)}
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (640, 640, 3), np.uint8) for _ in range(16)]

    # 1. dispatch vs completion.
    x = jax.device_put(frames[0], dev)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    handles = [jax.device_put(f, dev) for f in frames]
    out["put_dispatch_ms_per_frame"] = (time.perf_counter() - t0) / 16 * 1e3
    t0 = time.perf_counter()
    jax.block_until_ready(handles)
    out["put_drain_ms_total"] = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    y = jax.device_put(frames[0], dev)
    jax.block_until_ready(y)
    out["put_blocking_ms"] = (time.perf_counter() - t0) * 1e3

    # 2. concurrent transfer threads.
    for nthreads in (1, 2, 4):
        pool = ThreadPoolExecutor(nthreads)

        def putb(f):
            h = jax.device_put(f, dev)
            jax.block_until_ready(h)
            return h

        list(pool.map(putb, frames[:4]))  # warm
        t0 = time.perf_counter()
        list(pool.map(putb, frames * 2))  # 32 frames
        dt = time.perf_counter() - t0
        out[f"put_threads{nthreads}_ms_per_frame"] = dt / 32 * 1e3
        pool.shutdown()

    # 3. fused program with a prefetch queue vs numpy feed.
    from vision_assist_tpu.config import ModelConfig, PipelineConfig
    from vision_assist_tpu.models.inference import Segmenter
    from vision_assist_tpu.pipeline.frame_processor import FrameProcessor

    cfg = PipelineConfig(frame_height=640, frame_width=640)
    seg = Segmenter(ModelConfig(imgsz=640), example_hw=(640, 640))
    wpath = REPO / "assets" / "weights" / "v8n_640_best.msgpack"
    if wpath.exists():
        from vision_assist_tpu.models.checkpoint import load_variables
        seg.variables = load_variables(wpath)
    fp = FrameProcessor(cfg, segmenter=seg)
    # warm + compile
    fp.retire_frame(fp.submit_frame(frames[0]))

    def run_numpy(n=40, depth=4):
        inflight = []
        t0 = time.perf_counter()
        for i in range(n):
            inflight.append(fp.submit_frame(frames[i % 16]))
            if len(inflight) > depth:
                fp.retire_frame(inflight.pop(0))
        for h in inflight:
            fp.retire_frame(h)
        return (time.perf_counter() - t0) / n * 1e3

    def run_prefetch(n=40, depth=4, nthreads=2):
        pool = ThreadPoolExecutor(nthreads)
        futs = [pool.submit(jax.device_put, frames[i % 16], dev)
                for i in range(min(n, depth + nthreads))]
        inflight = []
        t0 = time.perf_counter()
        for i in range(n):
            dev_frame = futs[i].result()
            if i + len(futs) - i < n:  # keep the queue topped up
                pass
            j = i + depth + nthreads
            if j < n:
                futs.append(pool.submit(jax.device_put, frames[j % 16], dev))
            inflight.append(fp.submit_frame(dev_frame))
            if len(inflight) > depth:
                fp.retire_frame(inflight.pop(0))
        for h in inflight:
            fp.retire_frame(h)
        dt = (time.perf_counter() - t0) / n * 1e3
        pool.shutdown()
        return dt

    out["fused_numpy_ms_per_frame"] = run_numpy()
    for nth in (1, 2, 4):
        out[f"fused_prefetch{nth}_ms_per_frame"] = run_prefetch(nthreads=nth)
    out.update(chip_quiet_status())
    path = REPO / "diagnostics" / "h2d_overlap.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
