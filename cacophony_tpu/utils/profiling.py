"""Tracing and profiling hooks.

The reference's only profiling is wall-clock json dumps
(embeddings/runner.py:107-121) and a commented-out lightning profiler
(task_predictions.py:1010) — SURVEY §5.  Here:

- `trace(logdir)`: jax.profiler trace context (open in XProf/TensorBoard);
  captures XLA ops, fusion, HBM usage on TPU
- `annotate(name)`: named region visible in the trace timeline
- `StageTimer`: lightweight per-stage wall timing with a device-sync fetch,
  for frontend/encode/score stage attribution in eval runs
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Wall-clock stage timing; `sync=True` forces a tiny device fetch so
    async dispatch doesn't hide device time (block_until_ready is a no-op on
    some relay backends)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result_fetch=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if result_fetch is not None:
                jax.device_get(result_fetch)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(f"{name}: {self.totals[name]:.3f}s "
                         f"({self.counts[name]} calls, "
                         f"{self.totals[name] / self.counts[name] * 1e3:.1f} ms/call)")
        return "\n".join(lines)
