"""Utilities: deterministic seeding, profiling/tracing, timers."""

from vsrlab_tpu.utils.seed import seed_index_everything, seed_everything
from vsrlab_tpu.utils.profiler import trace, Timer, annotate

__all__ = [
    "seed_index_everything",
    "seed_everything",
    "trace",
    "Timer",
    "annotate",
]
