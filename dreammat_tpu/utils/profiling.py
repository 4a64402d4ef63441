"""Tracing / profiling hooks.

The reference has none (SURVEY §5). Here: phase timers with aggregate
reporting plus optional ``jax.profiler`` trace capture, so prerender /
render / guidance phases are first-class metrics.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name}: {t:.2f}s total, {c} calls, {t/c*1000:.1f}ms avg")
        return "\n".join(lines)


@contextlib.contextmanager
def xla_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace (viewable in TensorBoard/XProf) when a
    directory is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging():
    """jax_debug_nans equivalent of the reference's anomaly-mode asserts
    (SURVEY §5 race-detection row)."""
    import jax

    jax.config.update("jax_debug_nans", True)
