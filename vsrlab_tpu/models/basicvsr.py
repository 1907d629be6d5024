"""BasicVSR: bidirectional recurrent video super-resolution (Flax).

Capability parity with the reference
(src/vsr/models/RealBasicVSR/modules/basicvsr.py:11-83), redesigned for TPU:

* the per-frame Python loops become two ``nn.scan`` recurrences over the
  time axis (backward then forward) with a donated hidden-state carry —
  one compiled loop body each, which XLA pipelines;
* both flow directions are computed in ONE batched SpyNet call
  (``2·B·(T-1)`` pairs) to keep the 7×7 convs MXU-saturated, instead of
  two sequential calls (reference :30-37);
* the boundary steps need no special-casing: the first step of each scan
  warps a zero hidden state, and warping zeros is zeros, so a zero flow is
  prepended and every step runs the same fused body;
* fusion + upsampling (point_conv, PixelShufflePack ×2, conv_last,
  bilinear residual — reference :62-83) run batched over ``B·T`` frames
  after the scans, not per-frame.

Input clips are ``(B, T, H, W, 3)`` in [0, 1]; output ``(B, T, sH, sW, 3)``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vsrlab_tpu.models.spynet import SpyNet
from vsrlab_tpu.nn.blocks import Conv2d, PixelShufflePack, ResidualBlock
from vsrlab_tpu.ops.resize import resize_bilinear
from vsrlab_tpu.ops.warp import flow_warp

Dtype = Any


class _PropagationCell(nn.Module):
    """One recurrence step: warp hidden state by flow, concat the current
    frame, run the residual stack (reference basicvsr.py:46-60)."""

    mid_channels: int
    res_blocks: int
    unroll: int = 4
    dtype: Dtype = None

    @nn.compact
    def __call__(self, feat_prop, inputs):
        lr_t, flow_t = inputs
        warped = flow_warp(feat_prop, flow_t)
        feat = jnp.concatenate([lr_t, warped], axis=-1)
        feat_prop = ResidualBlock(
            self.mid_channels, self.res_blocks, unroll=self.unroll,
            dtype=self.dtype,
        )(feat)
        return feat_prop, feat_prop


class BasicVSR(nn.Module):
    """Bidirectional recurrent VSR network.

    Attributes mirror the reference constructor
    (basicvsr.py:12-28): ``mid_channels``, ``res_blocks``, ``upscale``,
    ``train_flow`` (when False, flows are ``stop_gradient``-ed — the JAX
    equivalent of freezing SpyNet parameters).
    """

    mid_channels: int = 64
    res_blocks: int = 30
    upscale: int = 4
    train_flow: bool = False
    remat: bool = False  # rematerialise recurrence steps (long-clip training)
    # Fuse both propagation directions into ONE time-scan body with fully
    # unrolled residual stacks: the TPU executes a single instruction
    # stream, so two independent flat conv chains interleave on the MXU
    # (measured 31.2 vs 17.9 TFLOP/s useful — scripts/bench_blockdiag.py);
    # separate per-direction scans are loop thunks that CANNOT interleave,
    # which is why the round-1 "fused scan body with inner block scans"
    # attempt showed no gain (docs/tpu_kernel_notes.md). Numerics are
    # bit-identical: the directions never interact inside the body.
    fuse_directions: bool = True
    block_unroll: int = 0  # 0 = full unroll when fused, 4 otherwise
    # lax.scan unroll over the time axis. 0 = auto: fully unroll short
    # clips (T <= 8), scan otherwise. Forward time is unchanged, but the
    # scan BACKWARD carries a ~25% penalty the unrolled form avoids
    # (measured 141 vs 177 ms fwd+bwd at the b=4 t=6 64x64 train shape —
    # docs/tpu_kernel_notes.md round-3 train-step section). Long clips
    # keep the scan: compile time scales with T and the backward gap
    # amortises.
    time_unroll: int = 0
    dtype: Dtype = None

    def setup(self):
        cell_cls = nn.remat(_PropagationCell) if self.remat else _PropagationCell
        unroll = self.block_unroll or (
            self.res_blocks if self.fuse_directions else 4
        )
        self.spynet = SpyNet(dtype=self.dtype)
        self.backward_cell = cell_cls(
            self.mid_channels, self.res_blocks, unroll=unroll,
            dtype=self.dtype, name="backward_resblocks",
        )
        self.forward_cell = cell_cls(
            self.mid_channels, self.res_blocks, unroll=unroll,
            dtype=self.dtype, name="forward_resblocks",
        )
        self.point_conv = Conv2d(self.mid_channels, 1, 1, 0, dtype=self.dtype)
        self.upsample = [
            PixelShufflePack(self.mid_channels, 2, dtype=self.dtype)
            for _ in range(self.upscale // 2)
        ]
        self.conv_hr = Conv2d(64, 3, 1, 1, dtype=self.dtype)
        self.conv_last = Conv2d(3, 3, 1, 1, dtype=self.dtype)

    def compute_flow(self, lrs, prev=None):
        """Both flow directions in one batched SpyNet call
        (reference basicvsr.py:30-37). The image pyramid is shared across
        pairs/directions (``SpyNet.adjacent_pairs``) — each unique frame
        is resized/normalised/pooled once instead of ~3.6×.

        With ``prev`` (streaming: the previous window's last frame,
        ``(B, H, W, 3)``) the pair batch is extended by one leading frame
        so the forward half gains the real ``prev → frame0`` flow as its
        first entry; ``flows_forward`` then has ``t`` entries instead of
        ``t - 1``.
        """
        b, t, h, w, c = lrs.shape
        frames = lrs
        if prev is not None:
            frames = jnp.concatenate([prev[:, None], lrs], axis=1)
            t = t + 1
        flows = self.spynet.adjacent_pairs(frames.reshape(-1, h, w, c), t)
        if not self.train_flow:
            flows = jax.lax.stop_gradient(flows)
        fb, ff = jnp.split(flows, 2, axis=0)
        flows_backward = fb.reshape(b, t - 1, h, w, 2)
        flows_forward = ff.reshape(b, t - 1, h, w, 2)
        if prev is not None:
            # drop the (prev ← frame0) backward flow — the backward
            # recurrence stays window-local (it needs FUTURE frames)
            flows_backward = flows_backward[:, 1:]
        return flows_forward, flows_backward

    def __call__(self, lrs, stream_state=None, return_state=False):
        """Super-resolve a clip.

        ``stream_state`` / ``return_state`` implement exact streaming of
        the FORWARD recurrence across sequential windows (long-video
        serving): the state is ``(last_input_frame, forward_carry)``.
        Seeding a window with the previous window's state makes the
        forward-direction hidden states bitwise identical to a full-clip
        run (the first step warps the carried state by the real
        ``prev → frame0`` flow instead of the zero-flow boundary trick);
        the backward direction restarts per window, as any causal
        streamer must. The reference resets BOTH directions every window
        (src/test.py:124-135).
        """
        b, t, h, w, c = lrs.shape
        prev = None if stream_state is None else stream_state[0]
        flows_forward, flows_backward = self.compute_flow(lrs, prev)

        zero_flow = jnp.zeros((b, 1, h, w, 2), flows_forward.dtype)
        # backward scan visits frames t-1..0; step i warps with
        # flows_backward[i] (and the first step's flow is never used
        # because the hidden state is zero)
        bwd_flows = jnp.concatenate(
            [zero_flow, jnp.flip(flows_backward, axis=1)], axis=1
        )
        if stream_state is None:
            fwd_flows = jnp.concatenate([zero_flow, flows_forward], axis=1)
        else:
            fwd_flows = flows_forward  # t entries; [:, 0] is prev -> frame0

        feat0 = jnp.zeros(
            (b, h, w, self.mid_channels), self.dtype or lrs.dtype
        )
        fwd_feat0 = (
            feat0 if stream_state is None
            else stream_state[1].astype(feat0.dtype)
        )
        lrs_rev = jnp.flip(lrs, axis=1)

        if self.fuse_directions:
            # one scan, both directions per step (independent carries)
            def body(mdl, carry, xs):
                fb, ff = carry
                lr_b, fl_b, lr_f, fl_f = xs
                fb, out_b = mdl.backward_cell(fb, (lr_b, fl_b))
                ff, out_f = mdl.forward_cell(ff, (lr_f, fl_f))
                return (fb, ff), (out_b, out_f)

            scan = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=1,
                out_axes=1,
                unroll=self.time_unroll or (t if t <= 8 else 1),
            )
            (_, ff_last), (outputs_backward, outputs_forward) = scan(
                self, (feat0, fwd_feat0), (lrs_rev, bwd_flows, lrs, fwd_flows)
            )
            outputs_backward = jnp.flip(outputs_backward, axis=1)
        else:
            scan = nn.scan(
                lambda cell, carry, xs: cell(carry, xs),
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=1,
                out_axes=1,
                unroll=self.time_unroll or (t if t <= 8 else 1),
            )
            _, outputs_backward = scan(
                self.backward_cell, feat0, (lrs_rev, bwd_flows)
            )
            outputs_backward = jnp.flip(outputs_backward, axis=1)
            ff_last, outputs_forward = scan(
                self.forward_cell, fwd_feat0, (lrs, fwd_flows)
            )

        # fusion + upsampling, batched over all frames
        out = jnp.concatenate([outputs_backward, outputs_forward], axis=-1)
        out = out.reshape(b * t, h, w, -1)
        out = nn.leaky_relu(self.point_conv(out), 0.1)
        for up in self.upsample:
            out = up(out)
        out = nn.leaky_relu(self.conv_hr(out), 0.1)
        out = self.conv_last(out)

        base = resize_bilinear(
            lrs.reshape(b * t, h, w, c),
            (h * self.upscale, w * self.upscale),
            align_corners=False,
        )
        out = out + base
        out = out.reshape(b, t, h * self.upscale, w * self.upscale, 3)
        if return_state:
            return out, (lrs[:, -1], ff_last)
        return out
