"""RealBasicVSR: cleaning module + BasicVSR (Flax).

Capability parity with the reference
(src/vsr/models/RealBasicVSR/realbasicvsr.py:5-30): an
:class:`~vsrlab_tpu.nn.blocks.IterativeRefinement` cleaner removes
compression artifacts from the low-res clip, then BasicVSR super-resolves
it. Returns ``(sr, lq)`` where ``lq`` is the cleaned input — the trainer
adds a cleaning loss ``loss(lq, resize(hr))`` (reference
src/core/utils.py:235-240).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vsrlab_tpu.models.basicvsr import BasicVSR
from vsrlab_tpu.nn.blocks import IterativeRefinement

Dtype = Any


class RealBasicVSR(nn.Module):
    mid_channels: int = 64
    res_blocks: int = 30
    cleaning_blocks: int = 20
    cleaning_steps: int = 3
    upscale: int = 4
    train_flow: bool = False
    remat: bool = False
    fuse_directions: bool = True  # see BasicVSR.fuse_directions
    block_unroll: int = 0
    time_unroll: int = 0  # see BasicVSR.time_unroll
    dtype: Dtype = None

    @nn.compact
    def __call__(
        self, lr: jnp.ndarray, stream_state=None, return_state=False
    ) -> Tuple[jnp.ndarray, ...]:
        """Returns ``(sr, lq)``; with ``return_state`` also the streaming
        state (see :meth:`BasicVSR.__call__` — the state's frame is the
        CLEANED previous frame, since flows are computed on cleaned
        input)."""
        b, t, h, w, c = lr.shape
        lq = IterativeRefinement(
            self.mid_channels,
            self.cleaning_blocks,
            self.cleaning_steps,
            dtype=self.dtype,
            name="cleaner",
        )(lr.reshape(b * t, h, w, c)).reshape(b, t, h, w, c)
        out = BasicVSR(
            self.mid_channels,
            self.res_blocks,
            self.upscale,
            self.train_flow,
            self.remat,
            fuse_directions=self.fuse_directions,
            block_unroll=self.block_unroll,
            time_unroll=self.time_unroll,
            dtype=self.dtype,
            name="basicvsr",
        )(lq, stream_state=stream_state, return_state=return_state)
        if return_state:
            sr, state = out
            return sr, lq, state
        return out, lq
