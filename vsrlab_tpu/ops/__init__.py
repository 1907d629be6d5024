"""Kernel layer: TPU-native implementations of the reference's hot primitives.

Every op here is a pure function on channels-last arrays. These replace the
CUDA-backed dependencies inventoried in SURVEY.md §2.9:

* ``grid_sample`` / ``flow_warp``  — replaces ``torch.nn.functional.grid_sample``
* ``resize_bilinear`` / ``resize_trilinear`` / ``resize_bicubic`` — replaces
  ``torch.nn.functional.interpolate`` (matmul-based, MXU-friendly)
* ``pixel_shuffle`` — replaces ``torch.nn.PixelShuffle`` (pure reshape/transpose)
* ``avg_pool2d`` — replaces ``torch.nn.functional.avg_pool2d``
* ``deform_conv2d`` — replaces ``torchvision.ops.deform_conv2d``
"""

from vsrlab_tpu.ops.resize import (
    resize_bilinear,
    resize_trilinear,
    resize_bicubic,
    resize,
)
from vsrlab_tpu.ops.pooling import avg_pool2d
from vsrlab_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from vsrlab_tpu.ops.warp import grid_sample, flow_warp
from vsrlab_tpu.ops.deform import deform_conv2d, modulated_deform_conv2d
from vsrlab_tpu.ops.correlation import (
    all_pairs_correlation,
    spatial_correlation_sample,
)

__all__ = [
    "resize_bilinear",
    "resize_trilinear",
    "resize_bicubic",
    "resize",
    "avg_pool2d",
    "pixel_shuffle",
    "pixel_unshuffle",
    "grid_sample",
    "flow_warp",
    "deform_conv2d",
    "modulated_deform_conv2d",
    "all_pairs_correlation",
    "spatial_correlation_sample",
]
