"""Multi-stream serving: N camera streams in one jitted, mesh-sharded program.

This is new capability with no reference counterpart (the reference is
strictly frame-at-a-time, SURVEY.md §2.4): the stream axis is the data-parallel
axis. One program per step runs segmentation + planning for every stream;
with a multi-chip mesh the batch shards over 'dp' and XLA moves data over ICI.
Per-stream temporal state (instruction memory) stays host-side and explicit.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from vision_assist_tpu.config import PipelineConfig
from vision_assist_tpu.pipeline.frame_processor import FrameProcessor, FrameResult
from vision_assist_tpu.pipeline.planner import make_plan_step
from vision_assist_tpu.semantics.analyser import InstructionEngine


class MultiStreamProcessor:
    """Batched pipeline over `num_streams` concurrent streams.

    Drives the same device programs as FrameProcessor but vmapped over the
    stream axis; host semantics run per stream with independent memory.
    """

    def __init__(self, cfg: PipelineConfig, segmenter=None,
                 mesh=None, replay_rounding: bool = False):
        import jax

        self.cfg = cfg
        self.num_streams = cfg.num_streams
        self.segmenter = segmenter
        self.mesh = mesh

        plan = make_plan_step(cfg, replay_rounding=replay_rounding,
                              include_paths=cfg.pathfinder.engine != "exact")
        self._plan_batched = jax.jit(jax.vmap(plan))
        # exact_device: per-stream on-chip angle caches (each stream is its
        # own PathFinder singleton, like the per-stream analysers below).
        self._stream_caches = None
        if cfg.pathfinder.engine == "exact_device":
            import jax.numpy as jnp

            from vision_assist_tpu.planning.device_astar import empty_cache
            self._stream_caches = jnp.stack(
                [empty_cache()] * cfg.num_streams)

        if segmenter is not None:
            # Fused full-frame path: ONE batched program (seg + plan) and ONE
            # packed (S, N) transfer per step (pipeline/frame_program.py).
            from vision_assist_tpu.pipeline.frame_program import (
                make_frame_program,
            )
            device_fn, self._unpack = make_frame_program(
                cfg, segmenter, replay_rounding=replay_rounding)
            if self._stream_caches is not None:
                self._fused_batched = jax.jit(
                    lambda v, f, c: jax.vmap(
                        lambda f1, c1: device_fn(v, f1, c1))(f, c))
            else:
                self._fused_batched = jax.jit(
                    lambda v, f: jax.vmap(lambda f1: device_fn(v, f1))(f))
        else:
            self._fused_batched = None
            self._unpack = None

        # Per-stream host state and a single shared path-materialiser. Exact
        # engines carry a cross-frame angle cache (the reference's PathFinder
        # singleton state) — one per stream, like the per-stream analysers.
        self._fp = FrameProcessor(cfg, replay_rounding=replay_rounding)
        self.analysers = [InstructionEngine(cfg.analyser)
                          for _ in range(self.num_streams)]
        self._exact_engines = None
        self._pool = None
        if cfg.pathfinder.engine == "exact":
            from concurrent.futures import ThreadPoolExecutor

            self._exact_engines = [self._fp._make_exact_engine()
                                   for _ in range(self.num_streams)]
            # The native engine releases the GIL during its ctypes call, so
            # per-stream host planning (~0.3-1.6 ms each) overlaps.
            self._pool = ThreadPoolExecutor(max_workers=min(
                self.num_streams, 8))

    def close(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _shard(self, arr):
        if self.mesh is None:
            return arr
        import jax
        from vision_assist_tpu.parallel.mesh import batch_sharding

        return jax.device_put(arr, batch_sharding(self.mesh))

    def process_occupancies(self, occupancies: np.ndarray,
                            now_ms: int | Sequence[int] = 0
                            ) -> list[FrameResult]:
        """occupancies: (num_streams, R, C) bool."""
        import jax.numpy as jnp

        occ = np.asarray(occupancies, dtype=bool)
        assert occ.shape[0] == self.num_streams
        if self._stream_caches is not None:
            plans = self._plan_batched(self._shard(jnp.asarray(occ)),
                                       self._stream_caches)
            self._stream_caches = plans.astar_cache
        else:
            plans = self._plan_batched(self._shard(jnp.asarray(occ)))

        now = ([now_ms] * self.num_streams
               if np.isscalar(now_ms) else list(now_ms))
        import jax

        plan_list = [jax.tree.map(lambda x: x[s], plans)
                     for s in range(self.num_streams)]

        def paths_for(s):
            engine = self._exact_engines[s] if self._exact_engines else None
            return self._fp._paths_from_plan(plan_list[s], exact_engine=engine)

        if self._pool is not None:
            per_stream = list(self._pool.map(paths_for,
                                             range(self.num_streams)))
        else:
            per_stream = [paths_for(s) for s in range(self.num_streams)]

        results = []
        for s in range(self.num_streams):
            plan_s = plan_list[s]
            paths, peaks = per_stream[s]
            answer = self.analysers[s](
                self.cfg.frame_height, self.cfg.frame_width, paths, now[s])
            results.append(FrameResult(
                final_answer=answer, paths=paths, peaks=peaks,
                occupancy=occ[s],
                walkable=np.asarray(plan_s.walkable),
                artificial=np.asarray(plan_s.artificial),
                penalty=np.asarray(plan_s.penalty, np.float64),
            ))
        return results

    def submit_frames(self, frames: np.ndarray):
        """Dispatch the fused batched program for one (S, H, W, 3) uint8
        batch WITHOUT waiting; returns an opaque handle for retire_frames().

        The device-side A* caches chain submit-to-submit through device
        dependencies, so several batch steps can be in flight at once —
        retire in submit order. The batch is explicitly ``device_put`` so the
        relay streams it asynchronously instead of serialising it inline in
        the execute RPC (see FrameProcessor.submit_frame)."""
        import jax.numpy as jnp

        if self._fused_batched is None:
            raise ValueError("MultiStreamProcessor built without a segmenter")
        if self.cfg.transfer_format == "i420":
            from vision_assist_tpu.ops.yuv import bgr_to_i420_host
            frames = np.stack([bgr_to_i420_host(np.asarray(f))
                               for f in frames])
        frames_dev = self._shard(jnp.asarray(frames))
        if self._stream_caches is not None:
            packed, self._stream_caches = self._fused_batched(
                self.segmenter.variables, frames_dev, self._stream_caches)
        else:
            packed = self._fused_batched(self.segmenter.variables, frames_dev)
        # Enqueue the (S, N) payload's device->host copy behind the execute
        # so retire_frames never issues a lone blocking fetch (~27 ms relay
        # flush stall; see FrameProcessor.submit_frame).
        packed.copy_to_host_async()
        return packed

    def retire_frames(self, handle,
                      now_ms: int | Sequence[int] = 0) -> list[FrameResult]:
        """Fetch one submitted batch (single packed (S, N) transfer) and run
        the per-stream host halves."""
        payloads = [self._unpack(row) for row in np.asarray(handle)]

        now = ([now_ms] * self.num_streams
               if np.isscalar(now_ms) else list(now_ms))

        def paths_for(s):
            engine = self._exact_engines[s] if self._exact_engines else None
            p = payloads[s]
            if p.n_detections == 0:
                # No-detection gate, same as FrameProcessor.retire_frame:
                # the reference plants artificial cells only per detected
                # mask, so an empty stream frame yields no paths.
                return self._fp._empty_guidance(p)
            return self._fp._paths_from_arrays(
                walkable=p.walkable, artificial=p.artificial, peaks=p.peaks,
                penalty_f32=p.penalty, paths_batch=p.paths,
                exact_engine=engine)

        if self._pool is not None:
            per_stream = list(self._pool.map(paths_for,
                                             range(self.num_streams)))
        else:
            per_stream = [paths_for(s) for s in range(self.num_streams)]

        results = []
        for s in range(self.num_streams):
            p = payloads[s]
            paths, peaks, penalty = per_stream[s]
            answer = self.analysers[s](
                self.cfg.frame_height, self.cfg.frame_width, paths, now[s])
            empty = p.n_detections == 0
            zeros = np.zeros_like(p.walkable, dtype=bool) if empty else None
            results.append(FrameResult(
                final_answer=answer, paths=paths, peaks=peaks,
                occupancy=p.occupancy,
                walkable=zeros if empty else p.walkable,
                artificial=zeros if empty else p.artificial,
                penalty=penalty,
                n_detections=p.n_detections, best_conf=p.best_conf,
            ))
        return results

    def process_frames(self, frames: np.ndarray,
                       now_ms: int | Sequence[int] = 0) -> list[FrameResult]:
        """frames: (num_streams, H, W, 3) uint8 BGR. One fused batched
        program (segmentation + planning), one packed (S, N) transfer.
        Synchronous submit_frames + retire_frames; pipeline the two for
        throughput serving."""
        return self.retire_frames(self.submit_frames(frames), now_ms)
