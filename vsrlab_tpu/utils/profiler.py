"""Profiling and tracing hooks (capability the reference lacks —
SURVEY.md §5 "Tracing/profiling: minimal").

* :func:`trace` — context manager capturing a ``jax.profiler`` trace
  (viewable in TensorBoard / Perfetto) around a code region.
* :func:`annotate` — named TraceAnnotation for attributing device time
  to framework phases inside a trace.
* :class:`Timer` — wall-clock phase timer with a summary dict (the
  reference's epoch timers, src/train.py:87,113-115, generalised).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "./profile") -> Iterator[None]:
    """Capture a device+host profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Accumulating wall-clock timer: ``with timer("data"): ...``."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_s": self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }
