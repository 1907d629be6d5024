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
from vsrlab_tpu.nn.blocks import IterativeRefinement, pack_frame_pair_params

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
    # run the cleaner with two frames packed channel-wise (C=64 -> 128
    # MXU lanes, block-diagonal weights): measured 1.62x on the cleaner
    # chain at 720p-bench shapes, per-frame numerics unchanged
    # (docs/tpu_kernel_notes.md round-5 frame packing). Param tree and
    # checkpoints are identical either way; falls back to the plain path
    # when b*t is odd.
    frame_pack: bool = True
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
        cleaner = IterativeRefinement(
            self.mid_channels,
            self.cleaning_blocks,
            self.cleaning_steps,
            dtype=self.dtype,
            name="cleaner",
        )
        frames = lr.reshape(b * t, h, w, c)
        n = b * t
        if self.frame_pack and n % 2 == 0 and not self.is_initializing():
            # params stay the logical tree the (never-called-here) child
            # declared at init; the packed twin consumes their
            # block-diagonal expansion
            packed = IterativeRefinement(
                2 * self.mid_channels,
                self.cleaning_blocks,
                self.cleaning_steps,
                out_channels=2 * c,
                dtype=self.dtype,
            )
            pp = pack_frame_pair_params(self.variables["params"]["cleaner"])
            xp = jnp.concatenate([frames[: n // 2], frames[n // 2:]], axis=-1)
            yp = packed.apply({"params": pp}, xp)
            lq = jnp.concatenate([yp[..., :c], yp[..., c:]], axis=0)
        else:
            lq = cleaner(frames)
        lq = lq.reshape(b, t, h, w, c)
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
