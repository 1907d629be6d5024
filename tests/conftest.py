"""Test configuration: CPU-only JAX with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh (the capability the
torch reference structurally lacked — SURVEY.md §4). Env vars must be set
before the first ``import jax`` anywhere in the test process.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# this environment pre-imports jax with the TPU platform selected, so the env
# var alone is not enough — override via the config API before first backend use
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: CPU compiles dominate suite wall time
# (~1 h cold); cached re-runs cut it dramatically. Keyed on program +
# jaxlib version, so it survives source edits that don't change traced
# programs.
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_compilation_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def to_nchw(x):
    """NHWC numpy -> NCHW numpy (for torch oracles)."""
    return np.ascontiguousarray(np.moveaxis(x, -1, -3))


def to_nhwc(x):
    """NCHW numpy -> NHWC numpy."""
    return np.ascontiguousarray(np.moveaxis(x, -3, -1))
