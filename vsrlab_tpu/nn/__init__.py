"""Flax building blocks shared by the model zoo.

TPU-first re-design of the reference's reusable NN modules
(reference: src/core/modules/). Everything is channels-last:
frames are ``(B, H, W, C)``, clips are ``(B, T, H, W, C)``.
"""

from vsrlab_tpu.nn.blocks import (
    ConvReLU,
    ConvLeaky,
    SpectralConv,
    ResidualConv,
    ResidualBlock,
    ConvST,
    ConvSTBlock,
    PixelShufflePack,
    PixelShufflePack3D,
    IterativeRefinement,
    DeformConvPack,
    DeformBlock,
    torch_conv_kernel_init,
)
from vsrlab_tpu.nn.mlp import Mlp, MixerBlock, MlpMixer
from vsrlab_tpu.nn.dct import EncoderDCT, DecoderIDCT

__all__ = [
    "ConvReLU",
    "ConvLeaky",
    "SpectralConv",
    "ResidualConv",
    "ResidualBlock",
    "ConvST",
    "ConvSTBlock",
    "PixelShufflePack",
    "PixelShufflePack3D",
    "IterativeRefinement",
    "DeformConvPack",
    "DeformBlock",
    "Mlp",
    "MixerBlock",
    "MlpMixer",
    "EncoderDCT",
    "DecoderIDCT",
    "torch_conv_kernel_init",
]
