"""Profiling helpers.

The reference ships wall-clock FPS meters only (SURVEY.md §5;
``eval_manager_mm.py:198,363-391``).  Here: the same FPS accounting
(in ``engine/eval.py``) plus proper device tracing — a context manager
around ``jax.profiler`` for perfetto/tensorboard traces, and a
``block_until_ready`` stage timer for per-op attribution.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates blocking wall-time per named stage."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def timed(self, name: str, fn, *args, **kw):
        with self.stage(name):
            out = fn(*args, **kw)
            jax.block_until_ready(out)
        return out

    def report(self) -> str:
        lines = []
        for k in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[k]
            t = self.totals[k]
            lines.append(f"{k:30s} {t:8.3f}s total  {1e3 * t / n:8.2f}ms/call"
                         f"  x{n}")
        return "\n".join(lines)
