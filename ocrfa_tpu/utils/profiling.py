"""Tracing and per-stage timing.

The reference has no instrumentation beyond a download progress bar
(SURVEY.md §5.1).  This module provides:

* ``StageTimer`` — lightweight accumulating wall-clock timers for pipeline
  stages (detect / group / preproc / recognize / decode), queryable as a
  report dict.
* ``trace`` — context manager around ``jax.profiler`` emitting an XPlane
  trace directory viewable in TensorBoard/Perfetto.
* ``annotate`` — ``jax.profiler.TraceAnnotation`` passthrough so host-side
  stages show up on the trace timeline.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulates wall-clock time and call counts per named stage."""

    def __init__(self):
        self._total = defaultdict(float)
        self._count = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._total[name] += time.perf_counter() - t0
            self._count[name] += 1

    def report(self) -> dict:
        return {
            name: {
                "total_s": round(self._total[name], 6),
                "calls": self._count[name],
                "mean_ms": round(1000 * self._total[name] / max(self._count[name], 1), 3),
            }
            for name in sorted(self._total)
        }

    def reset(self) -> None:
        self._total.clear()
        self._count.clear()


# module-level default timer used by the pipeline when enabled
GLOBAL_TIMER = StageTimer()


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device+host profile into ``log_dir`` (XPlane format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host-side region that appears on the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)
