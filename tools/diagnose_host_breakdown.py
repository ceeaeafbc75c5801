#!/usr/bin/env python
"""Decompose the pipelined serving loop's per-frame wall time on the host.

Round-5 finding: the post-outage relay transfers at device_put (~1 GB/s
incompressible, diagnostics/wire_ceiling.json) instead of serialising the
bytes into the consuming execute — so the old 50 MB/s wire model no longer
explains the serving numbers (74.5 FPS single / 87 batched-8 while the chip
itself runs ~2 ms/frame). Whatever now bounds throughput must be HOST work
in the driver thread.

Microbenches against this relay can mislead (its async completion makes
individual block_until_ready calls look free), so this tool times the REAL
loops cumulatively: every sub-stage of bench.py's depth-8 single-stream
pipeline and the batched-8 server is bracketed with perf_counter inside the
actual loop, and the stage sums are reported next to the loop's true wall
time. Stages sum to wall time by construction — no illusion survives that.

Stages (single-stream, mirrors FrameProcessor.submit_frame/retire_frame):
  pack      bgr -> i420 (cv2, host)
  put       np.ascontiguousarray + jax.device_put
  dispatch  the jitted fused call returning (async issue cost)
  hostcopy  payload.copy_to_host_async() issue
  wait      np.asarray(oldest handle) blocking until the payload is here
  unpack    payload struct view + no-detection gate
  plan      host planning half (_paths_from_arrays, C++ A* engine)
  analyse   instruction engine + FrameResult assembly

Writes diagnostics/host_breakdown.json.
"""

from __future__ import annotations

import collections
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def load_frames(n: int, hw: tuple[int, int]) -> list[np.ndarray]:
    import cv2

    val = pathlib.Path("/root/reference/model/valid/images")
    frames = []
    for p in sorted(val.glob("*.jpg"))[:n]:
        img = cv2.imread(str(p))
        if img.shape[:2] != hw:
            img = cv2.resize(img, (hw[1], hw[0]))
        frames.append(np.ascontiguousarray(img))
    if not frames:
        raise SystemExit("no validation frames found")
    while len(frames) < n:
        frames.append(frames[len(frames) % len(frames)])
    return frames


def single_stream(fp, frames, n, depth) -> dict:
    import jax

    from vision_assist_tpu.ops.yuv import bgr_to_i420_host

    t = collections.defaultdict(float)
    inflight = collections.deque()

    def retire_one(now_ms):
        t0 = time.perf_counter()
        handle, sub_ms = inflight.popleft()
        arr = np.asarray(handle)  # blocks until the payload crossed
        t["wait"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        payload = fp._unpack(arr)
        empty = payload.n_detections == 0
        t["unpack"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        if empty:
            paths, peaks, penalty = fp._empty_guidance(payload)
        else:
            paths, peaks, penalty = fp._paths_from_arrays(
                walkable=payload.walkable, artificial=payload.artificial,
                peaks=payload.peaks, penalty_f32=payload.penalty,
                paths_batch=payload.paths)
        t["plan"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        fp.analyser(fp.cfg.frame_height, fp.cfg.frame_width, paths, now_ms)
        t["analyse"] += time.perf_counter() - t0

    wall0 = time.perf_counter()
    for i in range(n):
        f = frames[i % len(frames)]
        t0 = time.perf_counter()
        plane = bgr_to_i420_host(f)
        t["pack"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        dev = jax.device_put(np.ascontiguousarray(plane))
        t["put"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        payload = fp._fused(fp.segmenter.variables, dev)
        t["dispatch"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        payload.copy_to_host_async()
        t["hostcopy"] += time.perf_counter() - t0

        inflight.append((payload, i * 33))
        if len(inflight) >= depth:
            retire_one(1000 + i * 33)
    while inflight:
        retire_one(9999)
    wall = time.perf_counter() - wall0

    out = {k: round(v / n * 1e3, 3) for k, v in t.items()}
    out["stage_sum_ms"] = round(sum(t.values()) / n * 1e3, 3)
    out["wall_ms_per_frame"] = round(wall / n * 1e3, 3)
    out["fps"] = round(n / wall, 2)
    return out


def batched(msp, frames, reps, depth) -> dict:
    t = collections.defaultdict(float)
    S = msp.num_streams
    sframes = np.stack(frames[:S])
    inflight = collections.deque()

    import jax
    import jax.numpy as jnp

    from vision_assist_tpu.ops.yuv import bgr_to_i420_host

    def retire_one(now_ms):
        t0 = time.perf_counter()
        handle = inflight.popleft()
        arr = np.asarray(handle)
        t["wait"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        payloads = [msp._unpack(row) for row in arr]
        t["unpack"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        def paths_for(s):
            engine = (msp._exact_engines[s]
                      if msp._exact_engines else None)
            p = payloads[s]
            if p.n_detections == 0:
                return msp._fp._empty_guidance(p)
            return msp._fp._paths_from_arrays(
                walkable=p.walkable, artificial=p.artificial,
                peaks=p.peaks, penalty_f32=p.penalty, paths_batch=p.paths,
                exact_engine=engine)
        if msp._pool is not None:
            per_stream = list(msp._pool.map(paths_for, range(S)))
        else:
            per_stream = [paths_for(s) for s in range(S)]
        t["plan"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        for s in range(S):
            msp.analysers[s](msp.cfg.frame_height, msp.cfg.frame_width,
                             per_stream[s][0], now_ms)
        t["analyse"] += time.perf_counter() - t0

    wall0 = time.perf_counter()
    for rep in range(reps):
        t0 = time.perf_counter()
        planes = np.stack([bgr_to_i420_host(f) for f in sframes])
        t["pack"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        dev = jax.device_put(jnp.asarray(planes))
        t["put"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        packed = msp._fused_batched(msp.segmenter.variables, dev)
        t["dispatch"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        packed.copy_to_host_async()
        t["hostcopy"] += time.perf_counter() - t0

        inflight.append(packed)
        if len(inflight) >= depth:
            retire_one(7000 + rep * 33)
    while inflight:
        retire_one(9999)
    wall = time.perf_counter() - wall0

    n = reps * S
    out = {k: round(v / reps * 1e3, 3) for k, v in t.items()}
    out["stage_sum_ms_per_batch"] = round(sum(t.values()) / reps * 1e3, 3)
    out["wall_ms_per_batch"] = round(wall / reps * 1e3, 3)
    out["fps"] = round(n / wall, 2)
    return out


def main() -> None:
    from vision_assist_tpu.utils.cache import enable as enable_cache
    enable_cache()

    import jax

    from vision_assist_tpu.config import PipelineConfig
    from vision_assist_tpu.models import flagship as flagship_mod
    from vision_assist_tpu.models.inference import Segmenter
    from vision_assist_tpu.pipeline.frame_processor import FrameProcessor
    from vision_assist_tpu.pipeline.multi_stream import MultiStreamProcessor

    device = jax.devices()[0]
    cfg = PipelineConfig(frame_height=640, frame_width=640,
                         transfer_format="i420")
    # Same model bench.py serves: the promoted flagship record.
    variables = flagship_mod.load_flagship_variables()
    seg = Segmenter(flagship_mod.model_config(), variables=variables,
                    example_hw=(640, 640), grid_size=cfg.grid.grid_size)

    frames = load_frames(30, (640, 640))

    fp = FrameProcessor(cfg, segmenter=seg)
    fp._ensure_fused()
    for i in range(3):  # compile + warm
        fp(frames[i], now_ms=i * 33)

    single = single_stream(fp, frames, n=60, depth=8)
    print("single-stream depth-8:", json.dumps(single), flush=True)

    msp = MultiStreamProcessor(cfg.replace(num_streams=8), segmenter=seg)
    msp.process_frames(np.stack(frames[:8]), now_ms=0)  # compile
    b = batched(msp, frames, reps=12, depth=2)
    print("batched-8 depth-2:", json.dumps(b), flush=True)
    msp.close()

    from vision_assist_tpu.utils.chipquiet import chip_quiet_status
    out = {
        "metric": "host-side per-stage breakdown of the pipelined serving "
                  "loops (cumulative in-loop timers; stages sum to wall)",
        "single_stream_depth8": single,
        "batched_8streams_depth2": b,
        "device": str(device),
        "platform": device.platform,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        **chip_quiet_status(),
    }
    p = REPO / "diagnostics/host_breakdown.json"
    p.write_text(json.dumps(out, indent=1))
    print(f"wrote {p}")


if __name__ == "__main__":
    main()
