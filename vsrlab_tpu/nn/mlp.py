"""MLP-Mixer over (time, patches, channels) axes.

Capability parity with the reference's experimental mixer
(reference src/core/modules/mlp.py:3-32): each MixerBlock applies a
residual MLP along the channel axis, then the patch axis, then the time
axis of a ``(B, T, P, C)`` token tensor. On TPU these are plain matmuls
along the last axis after cheap transposes XLA folds into the layout.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

Dtype = Any

# torch-default Linear init, shared with the conv blocks
from vsrlab_tpu.nn.blocks import (  # noqa: E402
    torch_conv_kernel_init as _torch_linear_init,
    uniform_bias_init as _bias_init,
)


class Dense(nn.Module):
    features: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            kernel_init=_torch_linear_init,
            bias_init=_bias_init(x.shape[-1]),
            dtype=self.dtype,
        )(x)


class Mlp(nn.Module):
    """Linear → GELU → Linear along the last axis (reference mlp.py:3-11)."""

    dim: int
    hidden_dim: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = Dense(self.hidden_dim, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        return Dense(self.dim, dtype=self.dtype)(x)


class MixerBlock(nn.Module):
    """Residual channel → patch → time mixing on (B, T, P, C)
    (reference mlp.py:13-24, permute choreography preserved)."""

    patches_dim: int
    channels_dim: int
    time_dim: int
    exp: int = 2
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        # channel mixing: last axis is C
        x = Mlp(self.channels_dim, self.exp * self.channels_dim, dtype=self.dtype)(x) + x
        x = x.transpose(0, 1, 3, 2)  # (B, T, C, P)
        x = Mlp(self.patches_dim, self.exp * self.patches_dim, dtype=self.dtype)(x) + x
        x = x.transpose(0, 2, 3, 1)  # (B, C, P, T)
        x = Mlp(self.time_dim, self.exp * self.time_dim, dtype=self.dtype)(x) + x
        x = x.transpose(0, 3, 2, 1)  # back to (B, T, P, C)
        return x


class MlpMixer(nn.Module):
    """Stack of MixerBlocks (reference mlp.py:26-32)."""

    patches_dim: int
    channels_dim: int
    time_dim: int
    exp: int = 2
    blocks: int = 4
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.blocks):
            x = MixerBlock(
                self.patches_dim,
                self.channels_dim,
                self.time_dim,
                self.exp,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x)
        return x
