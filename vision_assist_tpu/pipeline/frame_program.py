"""ONE jitted device program per frame, ONE device->host transfer.

Round-1 measurement showed the end-to-end frame time on this TPU was
dominated by relay dispatch: two separate jitted programs per frame plus 4+
independent device->host syncs (each a full round trip). This module fuses
the whole device side — letterbox -> YOLO-seg -> NMS -> masks -> occupancy ->
artificial cells -> penalty -> peaks (-> wavefront paths) -> blur metric —
into a single program whose output is ONE packed int32 vector, so a frame
costs exactly one dispatch and one fetch.

The payload layout is computed at build time (static shapes):

  [ flags (R*C)            bit0 walkable, bit1 artificial, bit2 occupancy
  , peaks (P*6)            centre_x, centre_y, left_x, right_x, orient, valid
  , meta  (3)              bitcast(blur_var f32), n_detections,
                           bitcast(best_conf f32)
  , penalty (R*C)          bitcast f32            -- include_paths only
  , path cells (K*L*2)     int32 (row, col), -1 pad -- include_paths only
  , path lengths (K)                               -- include_paths only
  , path costs (K)         bitcast f32             -- include_paths only
  , path valid (K)                                 -- include_paths only
  ]

In exact-engine mode (the default) the device does NOT compute the penalty
field at all: the host recomputes it in float64 for bit-parity anyway
(frame_processor._paths_from_plan), so shipping a float32 copy was pure
waste. The wavefront mode carries penalty + paths.

Reference behaviour being fused: FrameProcessor.__call__
(FrameProcessor.py:301-360) ran these stages as sequential host Python.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import numpy as np

from vision_assist_tpu.config import PipelineConfig
from vision_assist_tpu.ops.peaks import PeakSet
from vision_assist_tpu.pipeline.planner import make_plan_step


@dataclasses.dataclass
class FramePayload:
    """Host-side unpacked view of one frame's device results (all numpy)."""
    walkable: np.ndarray      # (R, C) bool
    artificial: np.ndarray    # (R, C) bool
    occupancy: np.ndarray     # (R, C) bool
    peaks: PeakSet            # numpy-leaf PeakSet
    blur_var: float
    n_detections: int
    best_conf: float
    penalty: np.ndarray | None = None   # (R, C) f32 (wavefront mode)
    paths: Any | None = None            # PathBatch of numpy (wavefront mode)


def make_frame_program(cfg: PipelineConfig, segmenter,
                       replay_rounding: bool = False
                       ) -> tuple[Callable, Callable]:
    """Build (device_fn, unpack).

    device_fn(variables, frame_bgr_u8) -> (N,) int32 packed payload (jit it /
    vmap it over a stream axis); unpack(np_payload) -> FramePayload.
    """
    import jax
    import jax.numpy as jnp

    from vision_assist_tpu.ops.blur import laplacian_variance
    from vision_assist_tpu.planning.wavefront import PathBatch

    if (segmenter.frame_h, segmenter.frame_w) != (cfg.frame_height,
                                                  cfg.frame_width) or \
            segmenter.grid_size != cfg.grid.grid_size:
        raise ValueError(
            f"segmenter geometry ({segmenter.frame_h}x{segmenter.frame_w}, "
            f"grid {segmenter.grid_size}) does not match the pipeline config "
            f"({cfg.frame_height}x{cfg.frame_width}, grid "
            f"{cfg.grid.grid_size}); build the Segmenter with "
            f"example_hw=(cfg.frame_height, cfg.frame_width)")
    include_paths = cfg.pathfinder.engine != "exact"
    exact_device = cfg.pathfinder.engine == "exact_device"
    plan = make_plan_step(cfg, replay_rounding=replay_rounding,
                          include_paths=include_paths)
    g = cfg.grid.grid_size
    rows, cols = cfg.frame_height // g, cfg.frame_width // g
    P = cfg.peaks.max_peaks
    K = P  # one candidate path per peak
    L = cfg.pathfinder.max_path_len

    # --- layout offsets ---------------------------------------------------------
    sizes = {"flags": rows * cols, "peaks": P * 6, "meta": 3}
    if include_paths:
        sizes.update({"penalty": rows * cols, "cells": K * L * 2,
                      "lengths": K, "costs": K, "pvalid": K})
    offsets = {}
    pos = 0
    for k, n in sizes.items():
        offsets[k] = (pos, pos + n)
        pos += n
    total = pos

    i420 = getattr(cfg, "transfer_format", "bgr") == "i420"

    def device_fn(variables, frame, astar_cache=None):
        """exact_device mode takes/returns the device-resident angle cache
        as a third argument: (payload, cache_out) instead of payload.

        ``frame`` is (H, W, 3) uint8 BGR, or the packed (H*3/2, W) uint8
        I420 plane when cfg.transfer_format == "i420" (the camera-native
        format at 2.13x fewer transfer bytes — ops/yuv.py)."""
        if i420:
            from vision_assist_tpu.ops.yuv import i420_to_bgr
            frame_bgr = i420_to_bgr(frame, cfg.frame_height, cfg.frame_width)
        else:
            frame_bgr = frame
        seg = segmenter._frame_chain(variables, frame_bgr)
        pr = (plan(seg.occupancy, astar_cache) if exact_device
              else plan(seg.occupancy))
        blur = laplacian_variance(frame_bgr)

        flags = (pr.walkable.astype(jnp.int32)
                 | (pr.artificial.astype(jnp.int32) << 1)
                 | (seg.occupancy.astype(jnp.int32) << 2))
        peaks = jnp.stack(
            [pr.peaks.centre_x, pr.peaks.centre_y, pr.peaks.left_x,
             pr.peaks.right_x, pr.peaks.orientation,
             pr.peaks.valid.astype(jnp.int32)], axis=-1)
        n_det = seg.detections.valid.sum().astype(jnp.int32)
        best_conf = jnp.where(seg.any_detection,
                              seg.detections.scores.max(), 0.0)
        meta = jnp.stack([
            jax.lax.bitcast_convert_type(blur.astype(jnp.float32), jnp.int32),
            n_det,
            jax.lax.bitcast_convert_type(best_conf.astype(jnp.float32),
                                         jnp.int32),
        ])
        parts = [flags.reshape(-1), peaks.reshape(-1), meta]
        if include_paths:
            parts += [
                jax.lax.bitcast_convert_type(
                    pr.penalty.astype(jnp.float32), jnp.int32).reshape(-1),
                pr.paths.cells.astype(jnp.int32).reshape(-1),
                pr.paths.lengths.astype(jnp.int32),
                jax.lax.bitcast_convert_type(
                    pr.paths.costs.astype(jnp.float32), jnp.int32),
                pr.paths.valid.astype(jnp.int32),
            ]
        packed = jnp.concatenate(parts)
        if exact_device:
            cache_out = pr.astar_cache
            if cfg.blur.enabled:
                # A blur-rejected frame must not mutate the cross-frame
                # angle cache: the reference's blur gate rejects the frame
                # BEFORE planning runs (FrameProcessor.py:44-48), so its
                # PathFinder singleton state stays untouched. The gate is
                # decided on-chip here because the cache feeds the next
                # submit before the host sees the blur metric.
                keep = blur >= cfg.blur.laplacian_var_threshold
                cache_out = jnp.where(keep, pr.astar_cache, astar_cache)
            return packed, cache_out
        return packed

    def unpack(buf: np.ndarray) -> FramePayload:
        buf = np.asarray(buf)
        assert buf.shape == (total,), (buf.shape, total)

        def seg_(name, shape=None, dtype=None):
            a, b = offsets[name]
            x = buf[a:b]
            if dtype is not None:
                x = x.view(dtype) if dtype == np.float32 else x.astype(dtype)
            return x.reshape(shape) if shape else x

        flags = seg_("flags", (rows, cols))
        pk = seg_("peaks", (P, 6))
        meta = seg_("meta")
        payload = FramePayload(
            walkable=(flags & 1).astype(bool),
            artificial=((flags >> 1) & 1).astype(bool),
            occupancy=((flags >> 2) & 1).astype(bool),
            peaks=PeakSet(
                centre_x=pk[:, 0], centre_y=pk[:, 1], left_x=pk[:, 2],
                right_x=pk[:, 3], orientation=pk[:, 4],
                valid=pk[:, 5].astype(bool)),
            blur_var=float(meta[0:1].view(np.float32)[0]),
            n_detections=int(meta[1]),
            best_conf=float(meta[2:3].view(np.float32)[0]),
        )
        if include_paths:
            payload.penalty = seg_("penalty", (rows, cols), np.float32)
            payload.paths = PathBatch(
                cells=seg_("cells", (K, L, 2)),
                lengths=seg_("lengths"),
                costs=seg_("costs", None, np.float32),
                valid=seg_("pvalid").astype(bool))
        return payload

    return device_fn, unpack
