"""Per-stage timing + device tracing.

Twin of the reference's profiling harness
(FrameProcessor_with_time_saving.py:316-416): bracket pipeline stages,
accumulate per-stage samples, drop outlier frames, and flush a
timing_data.txt-compatible artifact (avg/last/min/max per stage, seconds).
Adds jax.profiler trace capture for device-side breakdowns.
"""

from __future__ import annotations

import contextlib
import pathlib
import time
from collections import defaultdict


class StageTimer:
    def __init__(self, outlier_threshold_s: float | None = None):
        self.samples: dict[str, list[float]] = defaultdict(list)
        self._pending: dict[str, float] = {}
        self.outlier_threshold_s = outlier_threshold_s
        self._frame_dropped = False

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._pending[name] = self._pending.get(name, 0.0) + dt
            if (self.outlier_threshold_s is not None
                    and dt > self.outlier_threshold_s):
                # Reference drops whole frames when one stage blows up
                # (FrameProcessor_with_time_saving.py:376-378).
                self._frame_dropped = True

    def add_sample(self, name: str, dt: float) -> None:
        """Record an externally measured duration for this frame
        (e.g. the whole-frame wall time the caller already timed)."""
        self._pending[name] = self._pending.get(name, 0.0) + dt

    def end_frame(self) -> None:
        if not self._frame_dropped:
            for name, dt in self._pending.items():
                self.samples[name].append(dt)
        self._pending.clear()
        self._frame_dropped = False

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            out[name] = {"avg": sum(xs) / len(xs), "last": xs[-1],
                         "min": min(xs), "max": max(xs), "n": len(xs)}
        return out

    def write(self, path: str | pathlib.Path) -> None:
        """timing_data.txt-style artifact (values in seconds, like the
        reference's despite its 'nanoseconds' header — SURVEY.md §6 note)."""
        lines = []
        for name, s in self.summary().items():
            lines.append(f"{name}:")
            lines.append(f"    Avg: {s['avg']}")
            lines.append(f"    Last: {s['last']}")
            lines.append(f"    Min: {s['min']}")
            lines.append(f"    Max: {s['max']}")
        pathlib.Path(path).write_text("\n".join(lines) + "\n")

    def write_samples(self, path: str | pathlib.Path) -> None:
        """Raw per-frame samples as JSON — richer than the reference's
        aggregate artifact; consumed by tools/plot_timing.py for the box-plot
        view (twin of images/profiling_21_02/plot.py)."""
        import json

        pathlib.Path(path).write_text(json.dumps(dict(self.samples)))


@contextlib.contextmanager
def device_trace(log_dir: str | pathlib.Path):
    """Capture a jax.profiler trace (open with TensorBoard / Perfetto)."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
