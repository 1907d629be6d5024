"""Deterministic seeding.

Reference parity: ``seed_index_everything`` (src/core/utils.py:23-30 —
which crashes on a missing ``random`` import when a seed is set;
SURVEY.md §7.4). Here seeding covers python, numpy and returns a JAX
PRNGKey; JAX itself is functional so the key is the only device-side
state.
"""

from __future__ import annotations

import os
import random
from typing import Optional

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed python/numpy RNGs and return a jax PRNGKey."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    # NOTE: affects SUBPROCESSES only — CPython fixes hash randomisation
    # at interpreter startup, so this cannot change the current process
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)


def seed_index_everything(train_cfg, sanity: int = 42) -> jax.Array:
    """Config-driven seeding: uses ``cfg.seed_index`` when set, the sanity
    default otherwise (reference semantics, src/core/utils.py:23-30)."""
    seed = train_cfg.get("seed_index") if hasattr(train_cfg, "get") else None
    if seed is None:
        seed = sanity
    return seed_everything(int(seed))
