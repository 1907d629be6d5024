"""Training runtime: train states, jitted SPMD train/eval steps, trainers.

Replaces the reference's hand-rolled DDP loops (src/train.py,
src/train_gan.py, src/train_spynet.py) and runtime builders
(src/core/utils.py) with pure jitted step functions over a device mesh.
"""

from vsrlab_tpu.train.state import TrainState, create_train_state
from vsrlab_tpu.train.step import (
    make_supervised_train_step,
    make_eval_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_supervised_train_step",
    "make_eval_step",
]
