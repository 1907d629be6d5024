"""Host-side data pipeline (numpy in, device-sharded batches out).

Replaces the reference's torch Dataset/DataLoader stack
(src/vsr/dataset.py, src/core/augmentations.py,
src/core/utils.py:193-233): frame-folder datasets, on-the-fly bicubic
downscaling, realistic degradation augmentation (JPEG / video codec
round-trips), and a threaded prefetching loader that feeds
double-buffered device transfers.

Clips are numpy ``(T, H, W, C)`` float32 in [0, 1] on the host; batches
are ``(B, T, H, W, C)``.
"""

from vsrlab_tpu.data.augmentations import (
    Mirroring,
    RandomCrop,
    RandomFlip,
    RandomJPEGCompression,
    RandomVideoCompression,
    build_pipeline,
)
from vsrlab_tpu.data.datasets import DatasetVSR, SyntheticVSR, ValDatasetVSR, VideoDatasetVSR
from vsrlab_tpu.data.loader import DataLoader

__all__ = [
    "DatasetVSR",
    "VideoDatasetVSR",
    "ValDatasetVSR",
    "SyntheticVSR",
    "DataLoader",
    "RandomJPEGCompression",
    "RandomVideoCompression",
    "RandomCrop",
    "RandomFlip",
    "Mirroring",
    "build_pipeline",
]
