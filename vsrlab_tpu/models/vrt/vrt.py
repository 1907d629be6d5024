"""VRT / TinyVRT main models (Flax, channels-last).

Capability parity with the reference (src/vsr/models/VRT/vrt.py:41-354):
multi-scale SpyNet flows, nearest4-warped neighbour frames concatenated
onto the input (9·C channels), a U-shaped stack of Stages with skip
connections, an RTMSA reconstruction trunk, and a pixel-shuffle
upsampling ladder with a bilinear input residual.

TPU-first deltas (documented, intentional):

* clips are (B, T, H, W, C); the reference's (N, D, C, H, W) transposes
  don't exist;
* (1, 3, 3) Conv3d layers are 2-D convs over ``B·T`` flattened frames —
  identical math, simpler layout for XLA;
* both flow directions come from ONE batched SpyNet call;
* the nearest4 neighbour warping is batched over frames (reference
  loops per frame, vrt.py:210-228);
* full VRT uses 4 SpyNet levels (the original VRT design). The
  reference hardcodes 3 levels (vrt.py:231) which index-errors against
  its own 7-stage U-shape — one of the reference bugs not replicated
  (SURVEY.md §7.4);
* ``x.copy()`` crash at vrt.py:143 fixed by construction.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vsrlab_tpu.models.spynet import SpyNet
from vsrlab_tpu.models.vrt.stage import Stage
from vsrlab_tpu.models.vrt.tmsa import RTMSA
from vsrlab_tpu.models.vrt.window_attention import _dense
from vsrlab_tpu.nn.blocks import Conv2d
from vsrlab_tpu.ops.pixel_shuffle import pixel_shuffle
from vsrlab_tpu.ops.resize import resize_bilinear
from vsrlab_tpu.ops.warp import flow_warp

Dtype = Any


class _VRTBase(nn.Module):
    """Shared VRT implementation; VRT and TinyVRT fix the U-shape."""

    upscale: int = 4
    in_chans: int = 3
    out_chans: int = 3
    img_size: Sequence[int] = (6, 64, 64)
    window_size: Sequence[int] = (6, 8, 8)
    depths: Sequence[int] = (8, 8, 8, 8, 8, 4, 4)
    indep_reconsts: Sequence[int] = (-2, -1)
    embed_dims: Sequence[int] = (64, 64, 64, 64, 64, 80, 80)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6, 6)
    mul_attn_ratio: float = 0.75
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path_rate: float = 0.2
    optical_flow_train: bool = False
    pa_frames: int = 2
    deformable_groups: int = 16
    head_shard_axis: Optional[str] = None  # TP: shard attention heads
    # Rematerialise each Stage / RTMSA block in the backward pass.
    # Required to train the full paper config: the un-remat'd train step
    # at (1, 6, 64, 64) needs 21.8 G of HBM vs the chip's 15.75 G
    # (docs/tpu_kernel_notes.md round-3 full-VRT training section).
    # Forward-only inference is unaffected.
    remat: bool = False
    # Chunk each Stage's parallel-warping alignment over the frame-pair
    # batch (see Stage.align_chunks). 0 = fully batched; numerics are
    # identical. Set for large single-pass inference shapes where the
    # alignment temporaries dominate peak HBM.
    align_chunks: int = 0
    dtype: Dtype = None
    # subclass-fixed U-shape
    reshapes: Sequence[str] = ()
    scales: Sequence[int] = ()
    flow_levels: Sequence[int] = ()

    def _frame_conv(self, x, features, name):
        """(1,3,3) Conv3d ≙ per-frame 3×3 conv over flattened frames."""
        b, t = x.shape[:2]
        y = Conv2d(features, 3, 1, 1, dtype=self.dtype, name=name)(
            x.reshape((b * t,) + x.shape[2:])
        )
        return y.reshape((b, t) + y.shape[1:])

    def _get_flows(self, x) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        """Multi-scale flows, both directions in one SpyNet batch
        (reference get_flows, vrt.py:189-208)."""
        b, t, h, w, c = x.shape
        spynet = SpyNet(
            return_levels=tuple(self.flow_levels), dtype=self.dtype,
            name="optical_flow",
        )
        # shared-pyramid path: each unique frame resized/normalised/pooled
        # once; output layout identical to the materialised-pair call
        flows = spynet.adjacent_pairs(x.reshape(-1, h, w, c), t)
        if not isinstance(flows, list):
            flows = [flows]
        if not self.optical_flow_train:
            flows = [jax.lax.stop_gradient(f) for f in flows]
        backward, forward = [], []
        for i, f in enumerate(flows):
            fb, ff = jnp.split(f, 2, axis=0)
            s = 2**i
            backward.append(fb.reshape(b, t - 1, h // s, w // s, 2))
            forward.append(ff.reshape(b, t - 1, h // s, w // s, 2))
        return backward, forward

    @staticmethod
    def _aligned_image(x, flow_backward, flow_forward):
        """nearest4 neighbour warping, batched over frames
        (reference get_aligned_image, vrt.py:210-228)."""
        b, t, h, w, c = x.shape

        def flat(v):
            return v.reshape((-1,) + v.shape[2:])

        wb = flow_warp(flat(x[:, 1:]), flat(flow_backward), "nearest4")
        wb = wb.reshape(b, t - 1, h, w, 4 * c)
        x_backward = jnp.concatenate(
            [wb, jnp.zeros((b, 1, h, w, 4 * c), x.dtype)], axis=1
        )
        wf = flow_warp(flat(x[:, :-1]), flat(flow_forward), "nearest4")
        wf = wf.reshape(b, t - 1, h, w, 4 * c)
        x_forward = jnp.concatenate(
            [jnp.zeros((b, 1, h, w, 4 * c), x.dtype), wf], axis=1
        )
        return x_backward, x_forward

    def _stage_flow_stride(self) -> int:
        raise NotImplementedError

    def _forward_features(self, x, flows_backward, flows_forward, deterministic):
        raise NotImplementedError

    def _make_stage(self, i: int, dpr) -> Stage:
        depths, dims = list(self.depths), list(self.embed_dims)
        # nn.remat argnums count the module instance as 0; ``deterministic``
        # is Stage.__call__'s 4th arg and must stay trace-static.
        stage_cls = nn.remat(Stage, static_argnums=(4,)) if self.remat else Stage
        return stage_cls(
            in_dim=dims[i - 1],
            dim=dims[i],
            depth=depths[i],
            num_heads=self.num_heads[i],
            window_size=self.window_size,
            mul_attn_ratio=self.mul_attn_ratio,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            drop_path=dpr[sum(depths[:i]) : sum(depths[: i + 1])],
            pa_frames=self.pa_frames,
            deformable_groups=self.deformable_groups,
            reshape=self.reshapes[i],
            max_residue_magnitude=10.0 / self.scales[i],
            head_shard_axis=self.head_shard_axis,
            align_chunks=self.align_chunks,
            dtype=self.dtype,
            name=f"stage{i + 1}",
        )

    def _trunk(self, x, dpr, deterministic):
        """Final stage: LN + Linear, then RTMSA blocks
        (reference stage8, vrt.py:106-127)."""
        depths, dims = list(self.depths), list(self.embed_dims)
        ns = len(self.scales)
        x = nn.LayerNorm(dtype=self.dtype, name="trunk_norm_in")(x)
        x = _dense(dims[ns], dims[ns - 1], True, self.dtype, "trunk_linear_in")(x)
        indep = [i % len(depths) for i in self.indep_reconsts]
        rtmsa_cls = nn.remat(RTMSA, static_argnums=(2,)) if self.remat else RTMSA
        for i in range(ns, len(depths)):
            ws = (
                (1, self.window_size[1], self.window_size[2])
                if i in indep
                else tuple(self.window_size)
            )
            x = rtmsa_cls(
                dim=dims[i],
                depth=depths[i],
                num_heads=self.num_heads[i],
                window_size=ws,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                drop_path=dpr[sum(depths[:i]) : sum(depths[: i + 1])],
                head_shard_axis=self.head_shard_axis,
                dtype=self.dtype,
                name=f"trunk_rtmsa_{i}",
            )(x, deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, t, h, w, c = x.shape
        x_lq = x

        flows_backward, flows_forward = self._get_flows(x)
        x_b, x_f = self._aligned_image(x, flows_backward[0], flows_forward[0])
        x9 = jnp.concatenate([x, x_b, x_f], axis=-1)  # (B,T,H,W,9C)

        feat = self._frame_conv(x9, self.embed_dims[0], "conv_first")

        body = self._forward_features(
            feat, flows_backward, flows_forward, deterministic
        )
        feat = feat + _dense(
            self.embed_dims[0], self.embed_dims[-1], True, self.dtype,
            "conv_after_body",
        )(body)

        # reconstruction
        num_feat = 64
        y = self._frame_conv(feat, num_feat, "conv_before_upsample")
        y = nn.leaky_relu(y, 0.01)
        # pixel-shuffle ladder (reference Upsample, vrt.py:13-39)
        n_ups = int(np.log2(self.upscale))
        for i in range(n_ups):
            y = self._frame_conv(y, 4 * num_feat, f"up_conv_{i}")
            bt, tt, hh, ww, cc = y.shape
            y = pixel_shuffle(y.reshape(bt * tt, hh, ww, cc), 2).reshape(
                bt, tt, hh * 2, ww * 2, num_feat
            )
            y = nn.leaky_relu(y, 0.1)
        y = self._frame_conv(y, num_feat, "up_conv_out")
        y = self._frame_conv(y, self.out_chans, "conv_last")

        # bilinear input residual (reference trilinear resize, vrt.py:163-165)
        base = resize_bilinear(
            x_lq.reshape(b * t, h, w, c),
            (h * self.upscale, w * self.upscale),
            align_corners=False,
        ).reshape(b, t, h * self.upscale, w * self.upscale, c)
        return y + base, x_lq


class VRT(_VRTBase):
    """Full 7-stage VRT (scales 1,2,4,8,4,2,1; reference vrt.py:41-235)."""

    depths: Sequence[int] = (8, 8, 8, 8, 8, 8, 8, 4, 4, 4, 4, 4, 4)
    embed_dims: Sequence[int] = (
        120, 120, 120, 120, 120, 120, 120, 180, 180, 180, 180, 180, 180,
    )
    num_heads: Sequence[int] = (6,) * 13
    # 12, not the reference yaml's 16: offset groups must divide the
    # 120-channel embed dim (16 would crash torchvision's deform_conv2d
    # too; the original VRT REDS config uses 12)
    deformable_groups: int = 12
    reshapes: Sequence[str] = ("none", "down", "down", "down", "up", "up", "up")
    scales: Sequence[int] = (1, 2, 4, 8, 4, 2, 1)
    flow_levels: Sequence[int] = (2, 3, 4, 5)  # 4 scales: 1, 1/2, 1/4, 1/8

    def _forward_features(self, x, fb, ff, det):
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))
        x1 = self._make_stage(0, dpr)(x, fb[0::4], ff[0::4], det)
        x2 = self._make_stage(1, dpr)(x1, fb[1::4], ff[1::4], det)
        x3 = self._make_stage(2, dpr)(x2, fb[2::4], ff[2::4], det)
        x4 = self._make_stage(3, dpr)(x3, fb[3::4], ff[3::4], det)
        x = self._make_stage(4, dpr)(x4, fb[2::4], ff[2::4], det)
        x = self._make_stage(5, dpr)(x + x3, fb[1::4], ff[1::4], det)
        x = self._make_stage(6, dpr)(x + x2, fb[0::4], ff[0::4], det)
        x = x + x1
        return self._trunk(x, dpr, det)


class TinyVRT(_VRTBase):
    """5-stage VRT (scales 1,2,4,2,1; reference vrt.py:237-354)."""

    depths: Sequence[int] = (4, 4, 4, 4, 4, 4, 4)
    embed_dims: Sequence[int] = (32, 32, 32, 32, 32, 32, 32)
    num_heads: Sequence[int] = (4, 4, 4, 4, 4, 4, 4)
    deformable_groups: int = 4
    reshapes: Sequence[str] = ("none", "down", "down", "up", "up")
    scales: Sequence[int] = (1, 2, 4, 2, 1)
    flow_levels: Sequence[int] = (3, 4, 5)  # 3 scales: 1, 1/2, 1/4

    def _forward_features(self, x, fb, ff, det):
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))
        x1 = self._make_stage(0, dpr)(x, fb[0::3], ff[0::3], det)
        x2 = self._make_stage(1, dpr)(x1, fb[1::3], ff[1::3], det)
        x3 = self._make_stage(2, dpr)(x2, fb[2::3], ff[2::3], det)
        x = self._make_stage(3, dpr)(x3, fb[1::3], ff[1::3], det)
        x = self._make_stage(4, dpr)(x + x2, fb[0::3], ff[0::3], det)
        x = x + x1
        return self._trunk(x, dpr, det)
