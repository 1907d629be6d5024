"""Evaluation harness + parameter/speed benches (reference src/test.py,
src/params.py)."""

from vsrlab_tpu.evaluation.harness import (
    load_test_model,
    windowed_inference,
    run_test_matrix,
)
from vsrlab_tpu.evaluation.params_bench import param_count, speed_bench

__all__ = [
    "load_test_model",
    "windowed_inference",
    "run_test_matrix",
    "param_count",
    "speed_bench",
]
from vsrlab_tpu.evaluation.tiled import tiled_forward  # noqa: F401

# NOTE: evaluation.upscale (the video->video CLI) is intentionally NOT
# imported here: `python -m vsrlab_tpu.evaluation.upscale` would warn
# about the module pre-existing in sys.modules. Import it directly.
