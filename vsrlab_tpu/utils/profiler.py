"""Profiling and tracing hooks (capability the reference lacks —
SURVEY.md §5 "Tracing/profiling: minimal").

* :func:`trace` — context manager capturing a ``jax.profiler`` trace
  (viewable in TensorBoard / Perfetto) around a code region.
* :func:`annotate` — named TraceAnnotation for attributing device time
  to framework phases inside a trace.
* :class:`Timer` — wall-clock phase timer with a summary dict (the
  reference's epoch timers, src/train.py:87,113-115, generalised).
* :func:`best_time` — tunnel-safe best-of-repeats device timing
  (single forced host readback per measured batch).
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


def best_time(call_and_sync, n_iters: int = 5, repeats: int = 3,
              on_best=None) -> float:
    """Best-of-repeats per-call seconds for device microbenchmarks.

    ``call_and_sync(n)`` must issue ``n`` calls and force ONE host
    readback at the end (e.g. ``float(scalar)``) — on this box's axon
    stdio tunnel, ``block_until_ready`` does not reliably sync, so the
    readback IS the fence (CLAUDE.md). One warm call precedes timing.
    Shared by ``bench.py`` and the ``scripts/profile_*`` tools.

    ``on_best(seconds)`` (optional) is invoked with the best-so-far
    per-call time after the warm call and after every repeat, so callers
    can STREAM a provisional measurement before the loop finishes — on
    this box the tunnel can wedge between any two device calls, and a
    streamed provisional is the difference between "partial number on
    the scoreboard" and "timeout" (bench.py round-5 hardening). Callers
    whose warm call still includes a compile should issue one warm call
    themselves before handing over, or the first provisional lies.
    """
    t0 = time.perf_counter()
    call_and_sync(1)  # warm (compile served from cache or built here)
    best = time.perf_counter() - t0
    if on_best is not None:
        on_best(best)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        call_and_sync(n_iters)
        best = min(best, (time.perf_counter() - t0) / n_iters)
        if on_best is not None:
            on_best(best)
    return best
