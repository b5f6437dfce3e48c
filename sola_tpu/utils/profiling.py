"""Tracing / profiling utilities.

The reference's only instrumentation is wall-clock deltas dumped into
``runtime_info*.json`` (generate_tokens_grid.py:293-307, SURVEY.md §5). The
rebuild keeps that artifact (see trackgen CLIs) and adds first-class
``jax.profiler`` hooks for TPU traces plus a tiny stage timer.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto)
    when ``log_dir`` is set (or SOLA_TRACE_DIR in the env); no-op otherwise.
    """
    import jax
    log_dir = log_dir or os.environ.get("SOLA_TRACE_DIR")
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in device traces (TraceAnnotation)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulating wall-clock timer for pipeline stages."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {name: {"total_s": self.totals[name],
                       "count": self.counts[name],
                       "mean_s": self.totals[name] / self.counts[name]}
                for name in self.totals}

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=4)
