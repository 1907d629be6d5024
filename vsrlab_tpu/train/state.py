"""Train state: parameters + optimizer + mutable collections.

The functional replacement for the reference's (model, optimizer,
scheduler, scaler) quadruple (src/core/utils.py:92-135, :270-281):

* the LR schedule lives inside the optax transform (no scheduler object);
* bf16 autocast is a model ``dtype`` — no GradScaler on TPU;
* gradient clipping is ``optax.clip_by_global_norm`` in the chain.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


def copy_params(params):
    """A REAL copy of a param tree — aliasing the buffers would break the
    donated train step (the same buffer can't be donated twice). Jitted
    so it's one program, not per-leaf eager dispatches (the axon tunnel
    makes per-op dispatch pathologically slow)."""
    return jax.jit(lambda p: jax.tree.map(jnp.copy, p))(params)


class TrainState(train_state.TrainState):
    """TrainState with a mutable-collections slot (spectral-norm power
    iteration state lives in ``batch_stats``) and an optional
    exponential-moving-average parameter shadow (``ema_params`` — standard
    VSR training practice; capability beyond the reference, which
    evaluates raw weights only)."""

    batch_stats: Any = None
    ema_params: Any = None


def create_train_state(
    model: nn.Module,
    rng: jax.Array,
    example_input,
    tx: optax.GradientTransformation,
    init_jit: bool = True,
    ema_decay: float = 0.0,
    variables=None,
) -> TrainState:
    """Initialise model variables (under jit — per-op dispatch through the
    device tunnel is pathologically slow otherwise) and wrap in a state.

    ``ema_decay > 0`` seeds ``ema_params`` with a copy of the initial
    params; the train step (built with the same decay) then maintains
    ``ema ← decay·ema + (1-decay)·params`` after every update.

    Pass ``variables`` (a ``model.init``-shaped dict) to skip the init
    entirely and wrap an existing tree — bench.py's train leg reuses the
    worker-resident params its headline leg already built (re-initialising
    them cost a measured 18 s through the device tunnel, VERDICT r4).
    """
    if variables is None:
        init = jax.jit(model.init) if init_jit else model.init
        args = (example_input if isinstance(example_input, tuple)
                else (example_input,))
        variables = init(rng, *args)
    params = variables["params"]
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        batch_stats=variables.get("batch_stats"),
        ema_params=copy_params(params) if ema_decay else None,
        tx=tx,
    )
