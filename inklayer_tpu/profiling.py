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


def device_busy_ms(trace_dir: str):
    """(device_busy_ms, top-op list) from the newest jax.profiler trace in
    `trace_dir`.  Busy time = union length of device-track complete events
    (overlapping events are not double-counted; jit-module wrapper spans
    contain per-op events, so the union also avoids wrapper double-count).
    Shared by scripts/analyze_sweep_stalls.py and bench.py's attribution
    fields — a reader of BENCH_r*.json can tell tunnel weather (RTT up,
    busy flat) from a code regression (busy up) without a rerun."""
    import collections
    import glob
    import gzip
    import os

    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Chip" in n or "/device" in n.lower()}
    if not dev_pids:
        dev_pids = set(pid_names)
    spans = []
    agg = collections.Counter()
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in dev_pids
                and "dur" in e and "ts" in e):
            spans.append((e["ts"], e["ts"] + e["dur"]))
            agg[e["name"].split(".")[0]] += e["dur"]
    spans.sort()
    busy, end = 0.0, -1.0
    for s, t in spans:
        if s > end:
            busy += t - s
            end = t
        elif t > end:
            busy += t - end
            end = t
    return busy / 1e3, agg.most_common(12)
