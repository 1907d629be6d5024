"""Utilities: deterministic seeding, profiling/tracing, timers,
compilation cache."""

from vsrlab_tpu.utils.seed import seed_index_everything, seed_everything
from vsrlab_tpu.utils.profiler import trace, Timer, annotate, best_time


def enable_compilation_cache(directory: str | None = None) -> None:
    """Persist XLA compilations across processes (full VRT takes ~5 min
    to compile on v5e; cached reloads are seconds). Honors
    ``VSRLAB_CACHE_DIR``; defaults to ``~/.cache/vsrlab_tpu/xla``."""
    import os
    from pathlib import Path

    import jax

    if directory is None and jax.config.jax_compilation_cache_dir:
        return  # a cache is already configured (e.g. tests/conftest.py)
    directory = directory or os.environ.get(
        "VSRLAB_CACHE_DIR", str(Path.home() / ".cache" / "vsrlab_tpu" / "xla")
    )
    Path(directory).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


__all__ = [
    "seed_index_everything",
    "seed_everything",
    "trace",
    "Timer",
    "annotate",
    "best_time",
    "enable_compilation_cache",
]
