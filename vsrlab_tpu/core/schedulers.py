"""Learning-rate schedules as optax-compatible functions of the step count.

Replaces torch's stateful ``_LRScheduler`` objects with pure schedules:

* :func:`cosine_annealing` — torch ``CosineAnnealingLR`` closed form
  (the reference default, conf/train/scheduler/cosine.yaml).
* :func:`cosine_annealing_linear_warmup` — the reference's custom
  ``CosineAnnealingLinearWarmup`` (src/core/schedulers.py:7-119): linear warmup
  then cosine cycles whose length grows by ``cycle_mult`` and whose max LR
  decays by ``gamma`` per cycle.

Schedules return the LR for a given step; wire them into optax via
``optax.scale_by_learning_rate`` / ``optax.inject_hyperparams``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def cosine_annealing(base_lr: float, t_max: int, eta_min: float = 0.0):
    """Torch ``CosineAnnealingLR`` closed form:
    ``eta_min + (base - eta_min) * (1 + cos(pi * t / T_max)) / 2``."""

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        return eta_min + (base_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t / t_max)) / 2.0

    return schedule


def cosine_annealing_linear_warmup(
    max_lr: float,
    first_cycle_steps: int,
    min_lr: float | None = None,
    cycle_mult: float = 1.0,
    warmup_steps: int = 0,
    gamma: float = 1.0,
    min_lr_pow: int | None = None,
):
    """Warmup + cosine cycles (reference src/core/schedulers.py:7-119).

    Semantics per cycle: for ``s`` steps into the cycle,
    warmup phase (``s < warmup_steps``): linear from ``min_lr`` to the cycle's
    max LR; cosine phase: ``min_lr + (max - min) * (1 + cos(pi*(s-w)/(L-w)))/2``
    where ``L`` is the cycle length. Cycle length after the first is
    ``(L - w) * cycle_mult + w``; the max LR decays by ``gamma`` per cycle.
    """
    assert warmup_steps < first_cycle_steps
    assert (min_lr is None) != (min_lr_pow is None), "specify exactly one of min_lr / min_lr_pow"
    if min_lr_pow is not None:
        min_lr = max_lr * (10.0 ** -min_lr_pow)

    def cycle_of(step: jnp.ndarray):
        if cycle_mult == 1.0:
            cycle = step // first_cycle_steps
            s = step % first_cycle_steps
            length = jnp.full_like(jnp.asarray(step, jnp.float32), first_cycle_steps)
            return cycle, s, length
        # geometric cycles (reference src/core/schedulers.py:98-108)
        stepf = jnp.asarray(step, jnp.float32)
        ratio = stepf / first_cycle_steps * (cycle_mult - 1.0) + 1.0
        n = jnp.floor(jnp.log(ratio) / math.log(cycle_mult))
        start = first_cycle_steps * (cycle_mult**n - 1.0) / (cycle_mult - 1.0)
        s = stepf - start
        length = first_cycle_steps * cycle_mult**n
        return n, s, length

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        cycle, s, length = cycle_of(step)
        cycle_max = max_lr * (gamma ** jnp.asarray(cycle, jnp.float32))
        warm = (cycle_max - min_lr) * s / max(warmup_steps, 1) + min_lr
        denom = jnp.maximum(length - warmup_steps, 1.0)
        cos_lr = min_lr + (cycle_max - min_lr) * (
            1.0 + jnp.cos(jnp.pi * (s - warmup_steps) / denom)
        ) / 2.0
        return jnp.where(s < warmup_steps, warm, cos_lr)

    return schedule
