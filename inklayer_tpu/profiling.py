"""Profiling / tracing hooks.

The reference has no tracing at all (SURVEY.md §5 — prints and a tqdm bar).
Here: per-stage wall timers live in pipeline.runner.StageTimes; this module
adds XLA device traces (jax.profiler, viewable in TensorBoard/Perfetto) and
a scoped timer utility used across the runner.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA device trace for everything inside the scope."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Hierarchical wall-clock timers with JSON export."""

    def __init__(self):
        self.times: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, dict]:
        return {k: {"total_s": round(v, 4), "calls": self.counts[k],
                    "mean_s": round(v / self.counts[k], 4)}
                for k, v in sorted(self.times.items(),
                                   key=lambda kv: -kv[1])}

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)
