"""Spectral-norm U-Net discriminator for GAN fine-tuning (Flax).

Capability parity with the reference
(src/vsr/models/RealBasicVSR/modules/unet-discriminator.py:4-31): a
3-down / 3-up U-Net with additive skip connections, spectral-normalised
convolutions, LeakyReLU(0.2), producing a per-pixel logit map.

Spectral-norm power-iteration state lives in the ``batch_stats``
collection; pass ``update_stats=True`` during discriminator train steps.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from vsrlab_tpu.nn.blocks import Conv2d, SpectralConv
from vsrlab_tpu.ops.resize import resize_bilinear

Dtype = Any


def _up2(x):
    h, w = x.shape[1:3]
    return resize_bilinear(x, (h * 2, w * 2), align_corners=False)


class UNetDiscriminator(nn.Module):
    mid_channels: int = 64
    dtype: Dtype = None

    @nn.compact
    def __call__(self, img: jnp.ndarray, update_stats: bool = False):
        m = self.mid_channels
        lrelu = lambda x: nn.leaky_relu(x, 0.2)
        sconv = lambda feats, ks, st, pad, name: SpectralConv(
            feats, ks, st, pad, dtype=self.dtype, name=name
        )

        feat_0 = lrelu(Conv2d(m, 3, 1, 1, dtype=self.dtype, name="conv_0")(img))
        feat_1 = lrelu(sconv(m * 2, 4, 2, 1, "conv_1")(feat_0, update_stats))
        feat_2 = lrelu(sconv(m * 4, 4, 2, 1, "conv_2")(feat_1, update_stats))
        feat_3 = lrelu(sconv(m * 8, 4, 2, 1, "conv_3")(feat_2, update_stats))
        feat_3 = _up2(feat_3)
        feat_4 = _up2(lrelu(sconv(m * 4, 3, 1, 1, "conv_4")(feat_3, update_stats)) + feat_2)
        feat_5 = _up2(lrelu(sconv(m * 2, 3, 1, 1, "conv_5")(feat_4, update_stats)) + feat_1)
        feat_6 = lrelu(sconv(m, 3, 1, 1, "conv_6")(feat_5, update_stats)) + feat_0
        out = lrelu(sconv(m, 3, 1, 1, "conv_7")(feat_6, update_stats))
        out = lrelu(sconv(m, 3, 1, 1, "conv_8")(out, update_stats))
        return Conv2d(1, 3, 1, 1, dtype=self.dtype, name="conv_9")(out)
