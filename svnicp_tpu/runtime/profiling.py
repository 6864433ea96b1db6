"""Stage timing + device tracing.

Replaces the reference's steady-clock `Timer` + per-stage accumulators
(ref: svn-icp/include/core/ICPUtils.h:71-89, SVGDICP.cpp:98-116 and the
pipeline chrono spans OdometryPipeline.cpp:549-627) with:

- `StageTimer`: named wall-clock spans with running means, drained into
  RuntimeRecord-compatible dicts;
- `device_trace`: a context manager around `jax.profiler.trace` producing a
  TensorBoard/XProf trace of the on-device work (the reference had no
  device-level profiling at all).
"""

from __future__ import annotations

import collections
import contextlib
import time


class StageTimer:
    """Accumulating named timers: `with timer.span("align"): ...`."""

    def __init__(self):
        self.totals: dict[str, float] = collections.defaultdict(float)
        self.counts: dict[str, int] = collections.defaultdict(int)
        self.last: dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            self.last[name] = dt

    def means(self) -> dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}

    def report(self) -> str:
        return "  ".join(
            f"{k}={v * 1000:.1f}ms" for k, v in sorted(self.means().items())
        )

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
        self.last.clear()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XProf/TensorBoard device trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
