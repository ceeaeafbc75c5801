#!/usr/bin/env python
"""Device-time-only per-frame latency of the fused serving program (VERDICT r3 #4).

The sync p50 on this box is relay-bound (~31 ms RTT floor), so the <15 ms
north star must be demonstrated as a *device* property. Isolation method:
jit ONE program that lax.scan's the full fused frame step (letterbox -> seg
bf16 -> NMS -> mask decode -> occupancy -> artificial cells -> penalty ->
peaks -> paths/cache -> payload pack) over K device-resident frames, so a
single relay dispatch covers K frames and per-frame device time is
total / K with dispatch amortised to ~1/K. The residual dispatch overhead
is also measured (trivial-program RTT) and subtracted for the corrected
number.

Three engines are measured: "exact" (the served default — planning happens
host-side, so its row is the on-chip perception half), "wavefront" and
"exact_device" (full on-chip planning — these rows carry the end-to-end
device-time claim). Runs on the real chip; writes
diagnostics/device_p50.json.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

K = 30          # frames per dispatch
TRIALS = 12


def make_scan_runner(device_fn, exact_device: bool):
    """ONE jitted program scanning the fused frame step over K resident
    frames (the measurement isolator; payload-equivalence to per-frame
    calls is pinned by tests/test_frame_processor.py)."""
    import jax

    if exact_device:
        @jax.jit
        def run_k(variables, planes, cache):
            def step(cache, plane):
                payload, cache = device_fn(variables, plane, cache)
                return cache, payload
            cache, payloads = jax.lax.scan(step, cache, planes)
            return payloads, cache
    else:
        @jax.jit
        def run_k(variables, planes):
            def step(_, plane):
                return None, device_fn(variables, plane)
            _, payloads = jax.lax.scan(step, None, planes)
            return payloads
    return run_k


def measure_engine(engine: str, seg, frames_bgr: np.ndarray) -> dict:
    import jax
    import jax.numpy as jnp

    from vision_assist_tpu.config import PipelineConfig
    from vision_assist_tpu.ops.yuv import bgr_to_i420_host
    from vision_assist_tpu.pipeline.frame_program import make_frame_program

    cfg = PipelineConfig(frame_height=seg.frame_h, frame_width=seg.frame_w,
                         transfer_format="i420")
    import dataclasses
    cfg = cfg.replace(pathfinder=dataclasses.replace(cfg.pathfinder,
                                                     engine=engine))
    device_fn, _ = make_frame_program(cfg, seg)
    planes = np.stack([bgr_to_i420_host(f) for f in frames_bgr])
    exact_device = engine == "exact_device"

    run_k = make_scan_runner(device_fn, exact_device)
    if exact_device:
        from vision_assist_tpu.planning.device_astar import empty_cache
        cache0 = empty_cache()

    planes_dev = jax.device_put(jnp.asarray(planes))
    args = (seg.variables, planes_dev) + (
        (jax.device_put(cache0),) if exact_device else ())
    print(f"[{engine}] compiling + warming scan over {K} frame steps...",
          flush=True)
    t0 = time.time()
    jax.block_until_ready(run_k(*args))
    print(f"[{engine}] warm after {time.time() - t0:.1f}s", flush=True)
    jax.block_until_ready(run_k(*args))

    trials = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        jax.block_until_ready(run_k(*args))
        trials.append(time.perf_counter() - t0)
    trials = np.asarray(trials)
    return {
        "scan_total_p50_ms": round(float(np.percentile(trials, 50)) * 1e3, 2),
        "device_p50_ms_per_frame": round(
            float(np.percentile(trials / K, 50)) * 1e3, 3),
    }


def main() -> None:
    from vision_assist_tpu.utils.cache import enable as enable_cache
    enable_cache()

    import jax
    import jax.numpy as jnp

    from vision_assist_tpu.models import flagship as flagship_mod
    from vision_assist_tpu.models.inference import Segmenter

    device = jax.devices()[0]
    frame_h = frame_w = 640
    # Same model every serving surface deploys: the promoted flagship.
    flag = flagship_mod.flagship()
    weights = REPO / "assets" / "weights" / flag["asset"]
    variables = flagship_mod.load_flagship_variables()
    seg = Segmenter(flagship_mod.model_config(), variables=variables,
                    example_hw=(frame_h, frame_w), grid_size=20)

    from bench import ensure_quiet_chip, load_frames
    quiet = ensure_quiet_chip()
    frames_bgr = load_frames(K, (frame_h, frame_w))

    engines = {}
    for engine in ("exact", "wavefront", "exact_device"):
        try:
            engines[engine] = measure_engine(engine, seg, frames_bgr)
        except Exception as e:  # record, keep measuring the rest
            engines[engine] = {"error": f"{type(e).__name__}: {e}"}
        print(engine, engines[engine], flush=True)

    # Residual dispatch overhead: a trivial program round trip.
    @jax.jit
    def trivial(x):
        return x + 1
    xs = jax.device_put(jnp.zeros((8,), jnp.float32))
    jax.block_until_ready(trivial(xs))
    rtts = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        jax.block_until_ready(trivial(xs))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    for row in engines.values():
        if "scan_total_p50_ms" in row:
            row["device_p50_ms_dispatch_corrected"] = round(
                (row["scan_total_p50_ms"] - rtt * 1e3) / K, 3)

    full = [engines.get(e, {}).get("device_p50_ms_dispatch_corrected")
            for e in ("wavefront", "exact_device")]
    full = [v for v in full if isinstance(v, (int, float))]
    out = {
        "metric": "on-chip end-to-end ms/frame (fused program scanned over "
                  f"{K} resident frames; seg+plan+payload pack)",
        "engines": engines,
        "dispatch_rtt_ms": round(rtt * 1e3, 2),
        "frames_per_dispatch": K,
        "trials": TRIALS,
        "weights": weights.name if weights.exists() else "random-init",
        "model": f"{flag['arch']}@{flag['imgsz']}",
        "device": str(device),
        "north_star_under_15ms": bool(full and min(full) < 15.0),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        **quiet,
    }
    # Optional argv override so the watcher's CPU rehearsal cannot clobber
    # a real-chip diagnostics/device_p50.json (VERDICT r4 #6).
    path = (pathlib.Path(sys.argv[1]) if len(sys.argv) > 1
            else REPO / "diagnostics" / "device_p50.json")
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
