#!/usr/bin/env python
"""Device-time vs dispatch-time breakdown for the serving pipeline.

Separates, on the real chip:
  * relay round-trip latency (trivial jitted op, sync per call)
  * host->device transfer of one 1280x720 frame
  * segmentation chain: per-call sync latency vs pipelined throughput
    (dispatch depth-K without syncing — amortised cost ~= device time when
    the relay allows async queueing)
  * planning step: same
  * device->host fetch of the compact plan payload

Writes a JSON breakdown to --out (default diagnostics/latency.json) and
prints it. This is the measurement VERDICT.md round 1 asked for: how much of
the 971 ms frame was chip and how much was relay dispatch.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def timeit(fn, n=20, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="diagnostics/latency.json")
    ap.add_argument("--depth", type=int, default=8,
                    help="pipelining depth for amortised measurements")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vision_assist_tpu.utils.cache import enable as enable_cache
    enable_cache()

    from vision_assist_tpu.config import ModelConfig, replay_config
    from vision_assist_tpu.io.scenarios import load_scenario
    from vision_assist_tpu.models.inference import Segmenter
    from vision_assist_tpu.pipeline.planner import make_plan_step

    dev = jax.devices()[0]
    out: dict = {"device": str(dev)}
    frame_h, frame_w = 1280, 720

    # 1. relay RTT: trivial op, sync each call
    tiny = jax.device_put(jnp.zeros((8,), jnp.float32), dev)
    f_triv = jax.jit(lambda x: x + 1.0)
    f_triv(tiny).block_until_ready()
    out["rtt_trivial_ms"] = timeit(
        lambda: f_triv(tiny).block_until_ready()) * 1000

    # 2. host->device: one frame (2.76 MB)
    frame_np = np.random.default_rng(0).integers(
        0, 255, (frame_h, frame_w, 3), dtype=np.uint8)
    out["h2d_frame_ms"] = timeit(
        lambda: jax.device_put(frame_np, dev).block_until_ready(), n=10) * 1000

    # 3. segmentation chain
    t0 = time.perf_counter()
    seg = Segmenter(ModelConfig(imgsz=640), example_hw=(frame_h, frame_w))
    r = seg(frame_np)
    r.occupancy.block_until_ready()
    out["seg_compile_s"] = time.perf_counter() - t0

    frame_dev = jax.device_put(frame_np, dev)

    def seg_sync():
        seg._jitted(seg.variables, frame_dev).occupancy.block_until_ready()

    out["seg_sync_ms"] = timeit(seg_sync, n=15) * 1000

    def seg_pipelined():
        rs = [seg._jitted(seg.variables, frame_dev)
              for _ in range(args.depth)]
        rs[-1].occupancy.block_until_ready()

    out["seg_pipelined_ms"] = timeit(seg_pipelined, n=5) * 1000 / args.depth

    # device->host of just the occupancy (bool R x C)
    res = seg._jitted(seg.variables, frame_dev)
    res.occupancy.block_until_ready()
    out["d2h_occupancy_ms"] = timeit(
        lambda: np.asarray(res.occupancy), n=15) * 1000
    # device->host of the full SegFrameResult pytree (what a naive consumer
    # pulling every field pays)
    out["d2h_full_segresult_ms"] = timeit(
        lambda: jax.tree.map(np.asarray, res), n=5) * 1000

    # 4. plan step (exact mode shape: no wavefront)
    cfg = replay_config().replace(frame_height=frame_h, frame_width=frame_w)
    occ_np = load_scenario("right_turn")
    occ_dev = jax.device_put(jnp.asarray(occ_np), dev)

    plan_exact = make_plan_step(cfg, replay_rounding=True,
                                include_paths=False)
    t0 = time.perf_counter()
    p = plan_exact(occ_dev)
    jax.block_until_ready(p)
    out["plan_exact_compile_s"] = time.perf_counter() - t0
    out["plan_exact_sync_ms"] = timeit(
        lambda: jax.block_until_ready(plan_exact(occ_dev)), n=15) * 1000

    def plan_pipelined():
        ps = [plan_exact(occ_dev) for _ in range(args.depth)]
        jax.block_until_ready(ps[-1])

    out["plan_exact_pipelined_ms"] = timeit(
        plan_pipelined, n=5) * 1000 / args.depth

    # pulling the plan result leaf-by-leaf (what _paths_from_plan does today)
    p = plan_exact(occ_dev)
    jax.block_until_ready(p)

    def pull_leaves():
        np.asarray(p.walkable)
        np.asarray(p.artificial)
        np.asarray(p.penalty)
        np.asarray(p.peaks.valid)
        np.asarray(p.peaks.centre_x)
        np.asarray(p.peaks.centre_y)

    out["d2h_plan_leaves_ms"] = timeit(pull_leaves, n=10) * 1000

    # 5. wavefront plan step for comparison
    cfg_w = cfg.replace(pathfinder=dataclass_replace(
        cfg.pathfinder, engine="wavefront"))
    plan_wave = make_plan_step(cfg_w, replay_rounding=True,
                               include_paths=True)
    t0 = time.perf_counter()
    jax.block_until_ready(plan_wave(occ_dev))
    out["plan_wavefront_compile_s"] = time.perf_counter() - t0
    out["plan_wavefront_sync_ms"] = timeit(
        lambda: jax.block_until_ready(plan_wave(occ_dev)), n=10) * 1000

    path = pathlib.Path(args.out)
    path.parent.mkdir(parents=True, exist_ok=True)
    from vision_assist_tpu.utils.chipquiet import chip_quiet_status
    out.update(chip_quiet_status())
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


def dataclass_replace(obj, **kw):
    import dataclasses
    return dataclasses.replace(obj, **kw)


if __name__ == "__main__":
    main()
