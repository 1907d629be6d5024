"""Flow-guided modulated deformable alignment (BasicVSR++ style, Flax).

Capability parity with the reference ``DCNv2PackFlowGuided``
(src/vsr/models/VRT/modules/deform_conv.py:88-145):

* a 4-layer conv stack predicts, from [warped features, current frame
  features, flow], per-tap offset residues and modulation masks;
* offsets = ``max_residue_magnitude · tanh(residue) + tiled (dy, dx)
  flow prior``; masks = sigmoid;
* the deformable 3×3 conv itself is
  :func:`vsrlab_tpu.ops.deform.modulated_deform_conv2d` — bilinear taps
  as dense gathers + one MXU matmul (no CUDA im2col).

Channels-last: features (N, H, W, C), flows (N, H, W, 2) in (dx, dy).
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vsrlab_tpu.nn.blocks import Conv2d
from vsrlab_tpu.ops.deform import modulated_deform_conv2d

Dtype = Any


class FlowGuidedDeformAlign(nn.Module):
    out_channels: int
    deformable_groups: int = 16
    max_residue_magnitude: float = 10.0
    pa_frames: int = 2
    dtype: Dtype = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_flow_warpeds: List[jnp.ndarray],
        x_current: jnp.ndarray,
        flows: List[jnp.ndarray],
    ) -> jnp.ndarray:
        k, taps = 3, 9
        dg = self.deformable_groups

        feat = jnp.concatenate(x_flow_warpeds + [x_current] + flows, axis=-1)
        for i in range(3):
            feat = Conv2d(
                self.out_channels, 3, 1, 1, dtype=self.dtype, name=f"conv_offset_{i}"
            )(feat)
            feat = nn.leaky_relu(feat, 0.1)
        # final offset/mask head is zero-initialised (reference
        # init_offset, deform_conv.py:127-131): alignment starts as the
        # plain flow-guided warp
        out = nn.Conv(
            3 * taps * dg,
            (3, 3),
            padding=[(1, 1)] * 2,
            kernel_init=jax.nn.initializers.zeros,
            bias_init=jax.nn.initializers.zeros,
            dtype=self.dtype,
            name="conv_offset_3",
        )(feat)

        o1, o2, mask = jnp.split(out, 3, axis=-1)
        offset = self.max_residue_magnitude * jnp.tanh(
            jnp.concatenate([o1, o2], axis=-1)
        )
        # flow prior: (dy, dx) tiled over all taps and groups — matches
        # the torchvision interleaved offset layout the reference feeds
        flow_yx = flows[0][..., ::-1]  # (dx, dy) -> (dy, dx)
        offset = offset + jnp.tile(flow_yx, (1, 1, 1, taps * dg))
        mask = jax.nn.sigmoid(mask)

        # deformable conv weight/bias (torch ModulatedDeformConv init:
        # uniform(-1/sqrt(n), 1/sqrt(n)), zero bias — deform_conv.py:41-48)
        cin = x.shape[-1]
        stdv = 1.0 / np.sqrt(cin * k * k)
        weight = self.param(
            "weight",
            lambda rng, shape: jax.random.uniform(rng, shape, jnp.float32, -stdv, stdv),
            (k, k, cin, self.out_channels),
        )
        bias = self.param("bias", jax.nn.initializers.zeros, (self.out_channels,))
        return modulated_deform_conv2d(
            x, offset, mask, weight, bias, stride=1, padding=1
        )
