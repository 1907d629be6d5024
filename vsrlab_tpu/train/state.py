"""Train state: parameters + optimizer + mutable collections.

The functional replacement for the reference's (model, optimizer,
scheduler, scaler) quadruple (src/core/utils.py:92-135, :270-281):

* the LR schedule lives inside the optax transform (no scheduler object);
* bf16 autocast is a model ``dtype`` — no GradScaler on TPU;
* gradient clipping is ``optax.clip_by_global_norm`` in the chain.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import optax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    """TrainState with a mutable-collections slot (spectral-norm power
    iteration state lives in ``batch_stats``)."""

    batch_stats: Any = None


def build_optimizer(
    learning_rate: float | Callable[[int], float] = 1e-4,
    optimizer: str = "adam",
    weight_decay: float = 0.0,
    betas: tuple = (0.9, 0.999),
    eps: float = 1e-8,
    grad_clip: Optional[float] = None,
    frozen_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """Build the optax chain: [clip] → adam/adamw/sgd → [freeze mask].

    ``frozen_mask`` is a params-shaped pytree of bools; True = trainable.
    This replaces the reference's ``requires_grad=False`` freezing
    (basicvsr.py:25-28) at the optimizer level.
    """
    if optimizer in ("adam", "adamw"):
        if weight_decay or optimizer == "adamw":
            core = optax.adamw(
                learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                weight_decay=weight_decay,
            )
        else:
            core = optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
    elif optimizer == "sgd":
        core = optax.sgd(learning_rate)
    else:
        raise ValueError(f"unknown optimizer: {optimizer}")

    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(core)
    tx = optax.chain(*parts)
    if frozen_mask is not None:
        tx = optax.masked(tx, frozen_mask)
    return tx


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
