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
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """TrainState with a mutable-collections slot (spectral-norm power
    iteration state lives in ``batch_stats``)."""

    batch_stats: Any = None


def create_train_state(
    model: nn.Module,
    rng: jax.Array,
    example_input,
    tx: optax.GradientTransformation,
    init_jit: bool = True,
) -> TrainState:
    """Initialise model variables (under jit — per-op dispatch through the
    device tunnel is pathologically slow otherwise) and wrap in a state."""
    init = jax.jit(model.init) if init_jit else model.init
    args = example_input if isinstance(example_input, tuple) else (example_input,)
    variables = init(rng, *args)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=tx,
    )
