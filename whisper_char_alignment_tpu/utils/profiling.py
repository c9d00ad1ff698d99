"""Tracing / profiling hooks.

The reference has no observability beyond tqdm (SURVEY.md §5). Here: lightweight
per-stage wall timers (decode / capture / align / host bookkeeping) with an
end-of-run summary, plus an optional ``jax.profiler`` device trace for Perfetto.
"""

from __future__ import annotations

import collections
import contextlib
import json
import sys
import time
from typing import Dict, Optional


class StageTimers:
    """Accumulates wall time + counts per named stage."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: Dict[str, float] = collections.defaultdict(float)
        self.counts: Dict[str, int] = collections.defaultdict(int)
        self.units: Dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, units: int = 0):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1
            self.units[name] += units

    def summary(self) -> Dict[str, dict]:
        out = {}
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            out[name] = {
                "total_s": round(total, 4),
                "calls": self.counts[name],
                "ms_per_call": round(1000 * total / max(self.counts[name], 1), 2),
            }
            if self.units[name]:
                out[name]["units_per_s"] = round(self.units[name] / total, 2)
        return out

    def report(self, file=sys.stderr) -> None:
        if self.enabled and self.totals:
            print("stage profile: " + json.dumps(self.summary()), file=file)


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str]):
    """jax.profiler trace (Perfetto/XPlane) when ``trace_dir`` is set."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
