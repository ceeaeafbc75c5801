"""Public FrameProcessor API — the framework's equivalent of the reference's
FrameProcessor.__call__ (FrameProcessor.py:301-360), redesigned TPU-first:

* the device side is two jitted programs (segmentation chain, planning step)
  over fixed shapes;
* the host side materialises the (tiny) selected paths and runs sectioning +
  instruction synthesis;
* all cross-frame state (instruction memory) is explicit — no singletons;
* ``engine="exact"`` routes pathfinding through the bit-exact host twin
  instead of the on-chip wavefront, for reference parity mode.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np

from vision_assist_tpu.config import PipelineConfig
from vision_assist_tpu.golden.astar import AStarEngine, closest_cell_to_point
from vision_assist_tpu.golden.pipeline import materialize_cells
from vision_assist_tpu.models.inference import Segmenter
from vision_assist_tpu.pipeline.planner import make_plan_step
from vision_assist_tpu.planning.dedup import deduplicate_paths
from vision_assist_tpu.semantics.analyser import InstructionEngine
from vision_assist_tpu.semantics.sections import AnalysedPath, build_path
from vision_assist_tpu.types import Coordinate, Peak


@dataclasses.dataclass
class FrameResult:
    final_answer: str
    paths: list[AnalysedPath]
    peaks: list[Peak]
    occupancy: np.ndarray
    walkable: np.ndarray
    artificial: np.ndarray
    penalty: np.ndarray
    overlay: Optional[np.ndarray] = None
    # Model-path metadata (fused path only; 0 for replay/process_occupancy).
    n_detections: int = 0
    best_conf: float = 0.0


class FrameProcessor:
    """Process frames (or saved occupancy lattices) into guidance answers.

    Args:
        cfg: pipeline configuration (shapes, thresholds, engine choice).
        segmenter: optional segmentation model wrapper; omit for replay mode.
        debug: when True, results carry a rendered overlay frame.
        replay_rounding: use the replay harness's artificial-row rounding
            (run_on_main.py:104) instead of the live pipeline's
            (FrameProcessor.py:126-127).
    """

    def __init__(self, cfg: PipelineConfig | None = None,
                 segmenter: Segmenter | None = None, debug: bool = False,
                 replay_rounding: bool = False):
        self.cfg = cfg or PipelineConfig()
        if self.cfg.transfer_format == "i420":
            # Fail at construction with the clean error, not deep inside
            # cv2/jit at first submit: I420 needs even frame dimensions.
            from vision_assist_tpu.ops.yuv import i420_shape
            i420_shape(self.cfg.frame_height, self.cfg.frame_width)
        self.segmenter = segmenter
        self.debug = debug
        self._plan = make_plan_step(
            self.cfg, replay_rounding=replay_rounding,
            include_paths=self.cfg.pathfinder.engine != "exact")
        self.analyser = InstructionEngine(self.cfg.analyser)
        # Exact engine: prefer the native C++ implementation (bit-identical to
        # the numpy twin, ~40x faster); fall back when no compiler exists.
        self._exact = self._make_exact_engine()
        # Fused per-frame device program (segmentation + planning in ONE
        # jitted call returning ONE packed vector — pipeline/frame_program.py)
        # for the full-frame path; built lazily on first use.
        self._fused = None
        self._unpack = None
        self._replay_rounding = replay_rounding
        # engine="exact_device": the on-chip angle cache is explicit carried
        # state (the reference's PathFinder singleton cache), device-resident
        # across frames — it never crosses the host boundary.
        self._astar_cache = None
        if self.cfg.pathfinder.engine == "exact_device":
            from vision_assist_tpu.planning.device_astar import empty_cache
            self._astar_cache = empty_cache()

    # -- device -> host path materialisation --------------------------------------

    def _make_exact_engine(self):
        """A fresh exact engine with its own cross-frame angle cache — one per
        stream, mirroring the reference's per-process PathFinder singleton."""
        pf = self.cfg.pathfinder
        kwargs = dict(
            angle_window=pf.angle_window, angle_grace_deg=pf.angle_grace_deg,
            angle_exponent=pf.angle_exponent,
            angle_denominator=pf.angle_denominator,
            penalty_weight=pf.penalty_weight, angle_weight=pf.angle_weight,
            replicate_radians_cache_bug=pf.replicate_radians_cache_bug,
        )
        from vision_assist_tpu.planning import native as native_engine

        if native_engine.available():
            return native_engine.NativeAStarEngine(**kwargs)
        return AStarEngine(**kwargs)

    def _paths_from_plan(self, plan, exact_engine=None
                         ) -> tuple[list[AnalysedPath], list[Peak]]:
        """Device plan pytree -> host paths. Pulls leaves (device syncs) and
        delegates to the numpy core; the fused path avoids these per-leaf
        transfers entirely (see process_payload)."""
        paths, peaks, _ = self._paths_from_arrays(
            walkable=np.asarray(plan.walkable),
            artificial=np.asarray(plan.artificial),
            peaks=plan.peaks,
            penalty_f32=(None if self.cfg.pathfinder.engine == "exact"
                         else np.asarray(plan.penalty, np.float64)),
            paths_batch=plan.paths,
            exact_engine=exact_engine)
        return paths, peaks

    def _host_penalty(self, walkable: np.ndarray) -> np.ndarray:
        """Bit-parity float64 penalty field (native, falls back to numpy)."""
        cfg = self.cfg
        from vision_assist_tpu.planning.native import (
            available as native_available,
            native_penalty_field,
        )
        if native_available():
            return native_penalty_field(
                walkable,
                saturation_threshold=cfg.penalty.saturation_threshold,
                dominance_gain=cfg.penalty.dominance_gain)
        from vision_assist_tpu.golden.lattice import penalty_field as pf64
        return pf64(walkable,
                    saturation_threshold=cfg.penalty.saturation_threshold,
                    dominance_gain=cfg.penalty.dominance_gain)

    def _empty_guidance(self, payload):
        """The no-detection short-circuit's (paths, peaks, penalty) triple:
        nothing was detected, so no lattice exists and no cost field was
        ever computed (reference FrameProcessor.py:327-332)."""
        return [], [], np.zeros(payload.walkable.shape, np.float64)

    def _paths_from_arrays(self, walkable: np.ndarray, artificial: np.ndarray,
                           peaks, penalty_f32, paths_batch, exact_engine=None
                           ) -> tuple[list[AnalysedPath], list[Peak], np.ndarray]:
        """Numpy core of the host half: peak objects + A*/wavefront path
        materialisation + sectioning. Returns (paths, peaks, penalty) where
        penalty is the field actually used for costs (float64 host recompute
        in exact mode — the reference's arithmetic is float64 throughout)."""
        cfg = self.cfg
        g = cfg.grid.grid_size

        peak_objs = []
        n_peaks = int(np.asarray(peaks.valid).sum())
        for i in range(n_peaks):
            peak_objs.append(Peak(
                centre=Coordinate(int(peaks.centre_x[i]),
                                  int(peaks.centre_y[i])),
                left=Coordinate(int(peaks.left_x[i]),
                                int(peaks.centre_y[i])),
                right=Coordinate(int(peaks.right_x[i]),
                                 int(peaks.centre_y[i])),
                orientation=("up", "left", "right")[int(peaks.orientation[i])],
            ))

        raw: list[AnalysedPath] = []
        if cfg.pathfinder.engine == "exact":
            penalty = self._host_penalty(walkable)
            start = closest_cell_to_point(
                walkable, (cfg.frame_width // 2, cfg.frame_height), g)
            for peak in peak_objs:
                goal = closest_cell_to_point(
                    walkable, peak.centre.to_tuple(), g)
                if start is None or goal is None:
                    continue
                rc, cost = (exact_engine or self._exact).find_path(
                    walkable, penalty, start, goal, g)
                if rc:
                    raw.append(build_path(
                        materialize_cells(rc, penalty, artificial, g), cost,
                        min_straight=cfg.sections.min_straight_cells,
                        merge_below=cfg.sections.merge_below_cells,
                        sharp_angle_deg=cfg.sections.sharp_angle_deg))
        else:
            penalty = np.asarray(penalty_f32, np.float64)
            pb = paths_batch
            for i in range(n_peaks):
                if not bool(pb.valid[i]):
                    continue
                length = int(pb.lengths[i])
                rc = [tuple(x) for x in np.asarray(pb.cells[i][:length])]
                raw.append(build_path(
                    materialize_cells(rc, penalty, artificial, g),
                    float(pb.costs[i]),
                    min_straight=cfg.sections.min_straight_cells,
                    merge_below=cfg.sections.merge_below_cells,
                    sharp_angle_deg=cfg.sections.sharp_angle_deg))

        return (deduplicate_paths(raw, cfg.dedup.similarity_threshold),
                peak_objs, penalty)

    # -- entry points ---------------------------------------------------------------

    def process_occupancy(self, occupancy: np.ndarray,
                          now_ms: int | None = None,
                          frame: np.ndarray | None = None) -> FrameResult:
        """Model-bypassed entry point (the reference's saved-grid replay,
        run_on_main.py:147-201). ``occupancy`` is a bool (R, C) lattice."""
        import jax.numpy as jnp

        if now_ms is None:
            now_ms = int(time.time() * 1000)
        occ_dev = jnp.asarray(np.asarray(occupancy, dtype=bool))
        if self._astar_cache is not None:
            plan = self._plan(occ_dev, self._astar_cache)
            self._astar_cache = plan.astar_cache
        else:
            plan = self._plan(occ_dev)
        paths, peaks = self._paths_from_plan(plan)
        answer = self.analyser(self.cfg.frame_height, self.cfg.frame_width,
                               paths, now_ms)
        result = FrameResult(
            final_answer=answer, paths=paths, peaks=peaks,
            occupancy=np.asarray(occupancy, dtype=bool),
            walkable=np.asarray(plan.walkable),
            artificial=np.asarray(plan.artificial),
            penalty=np.asarray(plan.penalty, np.float64),
        )
        if self.debug:
            from vision_assist_tpu.io.visualiser import render_overlay
            result.overlay = render_overlay(
                self.cfg, result, frame=frame)
        return result

    # -- fused full-frame path (one dispatch, one fetch per frame) ------------------

    def _ensure_fused(self):
        if self._fused is None:
            import jax

            from vision_assist_tpu.pipeline.frame_program import (
                make_frame_program,
            )

            device_fn, self._unpack = make_frame_program(
                self.cfg, self.segmenter,
                replay_rounding=self._replay_rounding)
            self._fused = jax.jit(device_fn)

    def submit_frame(self, frame_bgr: np.ndarray):
        """Dispatch the fused device program for one frame WITHOUT waiting.

        Returns an opaque handle; pass it to retire_frame() to fetch and
        finish on the host. Keeping 2+ frames in flight overlaps the relay
        round trip with chip compute (the throughput path; per-frame latency
        is still one round trip).

        The frame is explicitly ``device_put`` first: handing raw numpy to
        the jitted call makes the relay serialise the 1.2 MB frame inline in
        the execute RPC (~20 ms, blocking — diagnostics/h2d_overlap.json),
        while an explicit transfer is ~1.3 ms and asynchronous, so back-to-
        back submits overlap transfer with chip compute."""
        if self.segmenter is None:
            raise ValueError(
                "FrameProcessor was built without a segmenter; use "
                "process_occupancy() for replay mode or pass a Segmenter.")
        self._ensure_fused()
        if self.cfg.transfer_format == "i420":
            if not isinstance(frame_bgr, np.ndarray):
                raise ValueError(
                    "transfer_format='i420' needs a host numpy BGR frame "
                    "(the I420 packing happens host-side)")
            from vision_assist_tpu.ops.yuv import bgr_to_i420_host
            frame_bgr = bgr_to_i420_host(frame_bgr)
        if isinstance(frame_bgr, np.ndarray):
            import jax
            frame_bgr = jax.device_put(np.ascontiguousarray(frame_bgr))
        if self._astar_cache is not None:
            payload, self._astar_cache = self._fused(
                self.segmenter.variables, frame_bgr, self._astar_cache)
        else:
            payload = self._fused(self.segmenter.variables, frame_bgr)
        # Enqueue the device->host copy NOW, behind the execute, so it
        # streams while later frames compute. A lone blocking fetch at
        # retire time stalls ~27 ms in the relay's flush path even when
        # the value is ready (diagnostics/h2d_overlap.json); an async
        # copy issued at submit costs ~0.
        payload.copy_to_host_async()
        return payload

    def retire_frame(self, handle, now_ms: int | None = None,
                     frame: np.ndarray | None = None) -> FrameResult | None:
        """Fetch a submitted frame's packed payload (the single device->host
        transfer) and run the host half. Returns None if the blur gate
        rejects the frame (reference: FrameProcessor.py:44-48 + main.py:78-94
        retry loop)."""
        if now_ms is None:
            now_ms = int(time.time() * 1000)
        payload = self._unpack(np.asarray(handle))
        if self.cfg.blur.enabled and \
                payload.blur_var < self.cfg.blur.laplacian_var_threshold:
            return None
        if payload.n_detections == 0:
            # Reference parity (FrameProcessor.py:67-69 + 327-332): with no
            # surviving detections the grid list stays EMPTY — artificial
            # cells are only planted inside the per-mask loop — so the live
            # path yields no paths and no guidance. The fused device program
            # runs fixed-shape and still plants artificial cells; without
            # this gate those cells fabricate a 2-cell path and the driver
            # would tell the user to move on a frame where the model saw
            # nothing. (The saved-grid REPLAY path keeps its artificial
            # cells — the reference's replay lattices bake them in.)
            paths, peaks, penalty = self._empty_guidance(payload)
        else:
            paths, peaks, penalty = self._paths_from_arrays(
                walkable=payload.walkable, artificial=payload.artificial,
                peaks=payload.peaks, penalty_f32=payload.penalty,
                paths_batch=payload.paths)
        answer = self.analyser(self.cfg.frame_height, self.cfg.frame_width,
                               paths, now_ms)
        empty = payload.n_detections == 0
        zeros = (np.zeros_like(payload.walkable, dtype=bool)
                 if empty else None)
        result = FrameResult(
            final_answer=answer, paths=paths, peaks=peaks,
            occupancy=payload.occupancy,
            walkable=zeros if empty else payload.walkable,
            artificial=zeros if empty else payload.artificial,
            penalty=penalty,
            n_detections=payload.n_detections,
            best_conf=payload.best_conf,
        )
        if self.debug:
            from vision_assist_tpu.io.visualiser import render_overlay
            result.overlay = render_overlay(self.cfg, result, frame=frame)
        return result

    def __call__(self, frame_bgr: np.ndarray,
                 now_ms: int | None = None) -> FrameResult | None:
        """Full pipeline: segmentation + planning + analysis on one frame —
        one fused jitted program, one device->host transfer.

        Returns None for frames rejected by the blur gate (when enabled —
        the reference's gate is FrameProcessor.py:44-48, disabled by default
        at :314-319; the driver then retries the next frame, main.py:78-94).
        """
        return self.retire_frame(self.submit_frame(frame_bgr),
                                 now_ms=now_ms, frame=frame_bgr)
