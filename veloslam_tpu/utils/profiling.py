"""Per-stage wall-clock counters + optional jax.profiler traces.

First-class replacement for the reference's ad-hoc tic/toc macros
(reference SimpleHDLTester.cxx:6-10, SURVEY.md §5 'Tracing/profiling').
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimers:
    """Accumulates wall-clock per named stage; cheap enough to always on."""

    def __init__(self):
        self._total = defaultdict(float)
        self._count = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._total[name] += dt
            self._count[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": self._total[k], "count": self._count[k],
                    "mean_ms": 1e3 * self._total[k] / max(self._count[k], 1)}
                for k in sorted(self._total)}

    def report(self) -> str:
        lines = [f"{k:24s} n={v['count']:6d}  mean={v['mean_ms']:8.2f} ms  "
                 f"total={v['total_s']:7.2f} s"
                 for k, v in self.summary().items()]
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Wrap a region in a jax.profiler trace when log_dir is given."""
    if log_dir is None:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield
