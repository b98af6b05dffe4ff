"""Profiling & observability: jax.profiler traces + wall-clock spans.

The reference has no tracing beyond ad-hoc time.time() prints (SURVEY §5);
here profiling is first-class: `trace(dir)` captures an xprof/Perfetto trace
of everything inside the context, `span(name)` adds named TraceAnnotations
visible in the trace viewer, and `StepTimer` aggregates wall-clock stats per
pipeline stage.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

__all__ = ["trace", "span", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device+host profile into `log_dir` (view with xprof /
    tensorboard-profile / ui.perfetto.dev)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def span(name: str):
    """Named annotation appearing on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock aggregation per stage: with timer.time("encode"): ..."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals}
