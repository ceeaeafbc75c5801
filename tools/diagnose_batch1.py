#!/usr/bin/env python
"""Third-stage latency diagnosis: WHY is the batch-1 fused program slow?

Round-2 measurements (diagnostics/fused_latency.json) showed the single-frame
fused program syncs in ~216 ms / pipelines at ~139 ms per call, while the
vmapped S=4 variant of the SAME function costs ~31 ms per call (7.8 ms/frame)
— i.e. one batched program is cheaper than one unbatched program. That smells
like an XLA lowering/layout pathology specific to the rank of the program,
not like real compute.

This tool bisects it on real hardware:
  1. stage-by-stage: jit seg chain alone, +blur, +plan, full packed program;
  2. rank probe: jit(vmap(device_fn)) at S=1 and S=2 — if S=1-vmapped is
     fast, the production fix is simply to always run the vmapped program;
  3. a jax.profiler trace of one sync call (written to diagnostics/trace/)
     so device time can be separated from relay dispatch.

Writes diagnostics/batch1_latency.json.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def timeit(fn, n=10, warmup=2):
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
    from vision_assist_tpu.ops.blur import laplacian_variance
    from vision_assist_tpu.pipeline.frame_program import make_frame_program
    from vision_assist_tpu.pipeline.planner import make_plan_step

    dev = jax.devices()[0]
    out = {"device": str(dev)}
    hw = 640

    cfg = PipelineConfig(frame_height=hw, frame_width=hw)
    seg = Segmenter(ModelConfig(imgsz=640), example_hw=(hw, hw))
    device_fn, _ = make_frame_program(cfg, seg)

    frame_np = np.random.default_rng(0).integers(
        0, 255, (hw, hw, 3), dtype=np.uint8)
    frame_dev = jax.device_put(jnp.asarray(frame_np), dev)
    v = seg.variables

    def bench(name, fn, *args, n=10):
        jitted = jax.jit(fn)
        t0 = time.perf_counter()
        jax.block_until_ready(jitted(*args))
        out[name + "_compile_s"] = round(time.perf_counter() - t0, 2)
        out[name + "_sync_ms"] = round(
            timeit(lambda: jax.block_until_ready(jitted(*args)), n=n) * 1000,
            3)
        def piped():
            hs = [jitted(*args) for _ in range(8)]
            jax.block_until_ready(hs[-1])
        out[name + "_pipelined_ms"] = round(timeit(piped, n=4) * 1000 / 8, 3)
        print(name, out[name + "_sync_ms"], out[name + "_pipelined_ms"],
              flush=True)
        return jitted

    # 1. stage bisect
    bench("seg_chain", seg._frame_chain, v, frame_dev)
    plan = make_plan_step(cfg, include_paths=False)
    occ = jax.jit(seg._frame_chain)(v, frame_dev).occupancy
    jax.block_until_ready(occ)
    bench("plan_only", plan, occ)
    bench("blur_only", laplacian_variance, frame_dev)
    fused = bench("fused_b1", device_fn, v, frame_dev)

    # 2. rank probe: the same function vmapped at S=1 / S=2
    for s in (1, 2):
        frames = jax.device_put(jnp.asarray(np.stack([frame_np] * s)), dev)
        bench(f"fused_vmap{s}",
              lambda vv, ff: jax.vmap(lambda f1: device_fn(vv, f1))(ff),
              v, frames)

    # 3. profiler trace of one sync call of the slow program
    trace_dir = pathlib.Path("diagnostics/trace")
    trace_dir.mkdir(parents=True, exist_ok=True)
    try:
        with jax.profiler.trace(str(trace_dir)):
            jax.block_until_ready(fused(v, frame_dev))
        out["trace_dir"] = str(trace_dir)
    except Exception as e:  # relay may not support profiling
        out["trace_error"] = repr(e)

    path = pathlib.Path("diagnostics/batch1_latency.json")
    from vision_assist_tpu.utils.chipquiet import chip_quiet_status
    out.update(chip_quiet_status())
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
