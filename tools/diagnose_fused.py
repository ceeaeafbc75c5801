#!/usr/bin/env python
"""Second-stage latency diagnosis: the FUSED frame program.

Measures, with device-resident inputs:
  * h2d of a 640x640 frame
  * fused program: sync per call vs pipelined depth-8 (per-program overhead)
  * fused program with numpy frame input (dispatch-blocking check)
  * batched fused program at S=4 and S=8 streams: per-frame amortised cost
    (does one bigger program beat N small ones on this relay?)
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def timeit(fn, n=15, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vision_assist_tpu.utils.cache import enable as enable_cache
    enable_cache()

    from vision_assist_tpu.config import ModelConfig, PipelineConfig
    from vision_assist_tpu.models.inference import Segmenter
    from vision_assist_tpu.pipeline.frame_program import make_frame_program

    dev = jax.devices()[0]
    out = {"device": str(dev)}
    hw = 640

    cfg = PipelineConfig(frame_height=hw, frame_width=hw)
    seg = Segmenter(ModelConfig(imgsz=640), example_hw=(hw, hw))
    device_fn, unpack = make_frame_program(cfg, seg)
    fused = jax.jit(device_fn)

    frame_np = np.random.default_rng(0).integers(
        0, 255, (hw, hw, 3), dtype=np.uint8)
    t0 = time.perf_counter()
    fused(seg.variables, frame_np).block_until_ready()
    out["fused_compile_s"] = time.perf_counter() - t0

    frame_dev = jax.device_put(jnp.asarray(frame_np), dev)
    out["h2d_frame640_ms"] = timeit(
        lambda: jax.device_put(frame_np, dev).block_until_ready()) * 1000

    out["fused_sync_ms"] = timeit(
        lambda: fused(seg.variables, frame_dev).block_until_ready()) * 1000

    depth = 8
    def pipelined():
        hs = [fused(seg.variables, frame_dev) for _ in range(depth)]
        hs[-1].block_until_ready()
    out["fused_pipelined_ms"] = timeit(pipelined, n=5) * 1000 / depth

    def np_input_pipelined():
        hs = [fused(seg.variables, frame_np) for _ in range(depth)]
        hs[-1].block_until_ready()
    out["fused_pipelined_npinput_ms"] = timeit(
        np_input_pipelined, n=5) * 1000 / depth

    # payload fetch cost
    h = fused(seg.variables, frame_dev)
    h.block_until_ready()
    out["d2h_payload_ms"] = timeit(lambda: np.asarray(h)) * 1000

    # batched fused
    for s in (4, 8):
        batched = jax.jit(lambda v, f: jax.vmap(
            lambda f1: device_fn(v, f1))(f))
        frames = jax.device_put(
            jnp.asarray(np.stack([frame_np] * s)), dev)
        t0 = time.perf_counter()
        batched(seg.variables, frames).block_until_ready()
        out[f"batched{s}_compile_s"] = time.perf_counter() - t0
        out[f"batched{s}_sync_ms_per_frame"] = timeit(
            lambda: batched(seg.variables, frames).block_until_ready(),
            n=10) * 1000 / s

        def bpipe():
            hs = [batched(seg.variables, frames) for _ in range(4)]
            hs[-1].block_until_ready()
        out[f"batched{s}_pipelined_ms_per_frame"] = timeit(
            bpipe, n=5) * 1000 / (4 * s)

    path = pathlib.Path("diagnostics/fused_latency.json")
    path.parent.mkdir(parents=True, exist_ok=True)
    from vision_assist_tpu.utils.chipquiet import chip_quiet_status
    out.update(chip_quiet_status())
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
