"""Tracing / profiling (SURVEY.md §5 tracing row).

The reference's only instrumentation is the wall-clock ``Stopwatch``
(reference: utils/utils.py:106-179, used around tasks and AdaRound layers).
TPU-native equivalents:

- :func:`trace` — context manager emitting a jax.profiler trace viewable
  in TensorBoard/Perfetto (device timelines, XLA op breakdown)
- :class:`PhaseTimer` — named phase accumulation (calibration, adaround,
  train, eval) with a report, the Stopwatch generalized
- :func:`annotate` — TraceAnnotation wrapper so phases show up inside the
  device trace
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace when a logdir is given; no-op otherwise."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulate wall-clock per named phase (Stopwatch, generalized)."""

    def __init__(self):
        self._totals: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            with annotate(name):
                yield
        finally:
            dt = time.perf_counter() - t0
            self._totals[name] = self._totals.get(name, 0.0) + dt
            self._counts[name] = self._counts.get(name, 0) + 1

    def totals(self) -> Dict[str, float]:
        return dict(self._totals)

    def report(self) -> str:
        lines = [f"{k:24s} {v:8.2f}s  x{self._counts[k]}"
                 for k, v in sorted(self._totals.items(),
                                    key=lambda kv: -kv[1])]
        return "\n".join(lines)
