"""Optical-flow training data: teacher-flow datasets + joint transforms.

Capability parity with the reference flow data layer
(src/optical_flow/dataset.py, src/optical_flow/transforms.py):

* :class:`FlowDataset` — items are precomputed teacher-flow files; the
  frame pair is resolved from the flow filename
  (``<video>_<frame1>_<frame2>.npz``); joint augmentation applies the
  same geometric transform to frames AND flow; codec compression applies
  to frames only.
* Joint transforms: Resize / RandomRotation / RandomHorizontalFlip /
  RandomVerticalFlip / RandomVideoCompression with per-call severity.
  NOTE (reference behavior, kept): geometric transforms move the flow
  FIELD but do not rotate/negate the flow VECTORS (reference
  transforms.py:32-77).
* :class:`SyntheticFlowDataset` — procedurally warped pairs with exact
  ground-truth flow; keeps the trainer runnable with no data on disk.

Flow files: ``.npz`` with keys ``flow`` (H, W, 2), optionally produced
by :mod:`vsrlab_tpu.data.create_flow_dataset`; the reference's torch
``.pt`` teacher files load through a gated torch import.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

from vsrlab_tpu.data.augmentations import RandomVideoCompression
from vsrlab_tpu.data.datasets import load_frame


# --- joint (frames, flow) transforms; all take/return numpy ---


class FlowCompose:
    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, frames, flow, rng):
        for t in self.transforms:
            frames, flow = t(frames, flow, rng)
        return frames, flow


class FlowResize:
    def __init__(self, height: int, width: int):
        self.size = (height, width)

    def __call__(self, frames, flow, rng):
        h, w = self.size
        frames = np.stack(
            [cv2.resize(f, (w, h), interpolation=cv2.INTER_LINEAR) for f in frames]
        )
        flow = cv2.resize(flow, (w, h), interpolation=cv2.INTER_LINEAR)
        return frames, flow


class FlowRandomRotation:
    def __init__(self, minmax, p: float = 0.5):
        self.minmax = (-minmax, minmax) if isinstance(minmax, int) else tuple(minmax)
        self.p = p

    def __call__(self, frames, flow, rng):
        if rng.random() > 1 - self.p:
            angle = float(rng.integers(self.minmax[0], self.minmax[1] + 1))
            h, w = frames.shape[1:3]
            m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
            frames = np.stack(
                [cv2.warpAffine(f, m, (w, h)) for f in frames]
            )
            flow = cv2.warpAffine(flow, m, (w, h))
        return frames, flow


class FlowRandomHorizontalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, frames, flow, rng):
        if rng.random() > 1 - self.p:
            frames = np.ascontiguousarray(frames[:, :, ::-1])
            flow = np.ascontiguousarray(flow[:, ::-1])
        return frames, flow


class FlowRandomVerticalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, frames, flow, rng):
        if rng.random() > 1 - self.p:
            frames = np.ascontiguousarray(frames[:, ::-1])
            flow = np.ascontiguousarray(flow[::-1])
        return frames, flow


class FlowVideoCompression:
    """Codec round-trip on frames only (reference transforms.py:78-107)."""

    def __init__(self, codec=("libx264",), crf=(34, 34), fps=(12, 12)):
        self.inner = RandomVideoCompression(codec, crf, fps)

    def __call__(self, frames, flow, rng):
        return self.inner(frames, rng), flow


def load_flow_file(path: Path) -> np.ndarray:
    """Load a teacher flow: .npz/.npy native, .pt via gated torch."""
    path = Path(path)
    if path.suffix == ".npz":
        return np.load(path)["flow"].astype(np.float32)
    if path.suffix == ".npy":
        return np.load(path).astype(np.float32)
    if path.suffix in (".pt", ".pth"):
        import torch

        t = torch.load(path, map_location="cpu")
        arr = np.asarray(t.detach().numpy() if hasattr(t, "detach") else t)
        if arr.ndim == 3 and arr.shape[0] == 2:  # (2, H, W) torch layout
            arr = arr.transpose(1, 2, 0)
        return arr.astype(np.float32)
    raise ValueError(f"unknown flow file type: {path}")


class FlowDataset:
    """Teacher-flow dataset (reference src/optical_flow/dataset.py:8-54).

    ``flows_dir`` holds flow files named ``<video>_<f1>_<f2>.<ext>``;
    ``frames_root/<video>/<f1>.*`` are the frames. Returns
    ``(frame1, frame2, flow)`` float32 numpy, channels-last.
    """

    def __init__(
        self,
        path: str,
        frames_root: str,
        split: str = "train",
        size: float = 0.9,
        augmentation: Optional[Callable] = None,
        compression: Optional[Callable] = None,
        seed: int = 0,
    ):
        self.items = sorted(Path(path).glob("*"))
        split_point = int(len(self.items) * size)
        if split == "train":
            self.items = self.items[:split_point]
        elif split == "val":
            self.items = self.items[split_point:]
        self.frames_root = Path(frames_root)
        self.augmentation = augmentation
        self.compression = compression
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __len__(self):
        return len(self.items)

    def _resolve(self, flow_path: Path) -> Tuple[Path, Path]:
        parts = flow_path.stem.split("_")
        video = "_".join(parts[:-2])
        f1 = next(iter((self.frames_root / video).glob(f"{parts[-2]}.*")))
        f2 = next(iter((self.frames_root / video).glob(f"{Path(parts[-1]).stem}.*")))
        return f1, f2

    def __getitem__(self, idx: int):
        rng = np.random.default_rng((self.seed, self._epoch, idx))
        flow = load_flow_file(self.items[idx])
        p1, p2 = self._resolve(self.items[idx])
        frames = np.stack([load_frame(p1), load_frame(p2)])
        if self.augmentation:
            frames, flow = self.augmentation(frames, flow, rng)
        if self.compression:
            frames, flow = self.compression(frames, flow, rng)
        return frames[0], frames[1], flow


class SyntheticFlowDataset:
    """Procedural (frame1, frame2, flow) triplets with exact ground truth:
    frame2 is frame1 translated by an integer per-sample displacement."""

    def __init__(
        self,
        num_samples: int = 32,
        height: int = 48,
        width: int = 64,
        max_shift: int = 3,
        augmentation: Optional[Callable] = None,
        compression: Optional[Callable] = None,
        split: str = "train",
        seed: int = 0,
        **_,
    ):
        self.n = num_samples
        self.h, self.w = height, width
        self.max_shift = max_shift
        self.augmentation = augmentation
        self.compression = compression
        self.seed = seed + (5000 if split == "val" else 0)
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int):
        rng = np.random.default_rng((self.seed, idx))
        pad = self.max_shift
        big = rng.random((self.h + 2 * pad, self.w + 2 * pad, 3)).astype(np.float32)
        if _HAS_CV2:
            big = cv2.GaussianBlur(big, (0, 0), 1.5)
        dx = int(rng.integers(-self.max_shift, self.max_shift + 1))
        dy = int(rng.integers(-self.max_shift, self.max_shift + 1))
        f1 = big[pad : pad + self.h, pad : pad + self.w]
        f2 = big[pad - dy : pad - dy + self.h, pad - dx : pad - dx + self.w]
        flow = np.full((self.h, self.w, 2), (dx, dy), np.float32)
        frames = np.stack([f1, f2])
        rng2 = np.random.default_rng((self.seed, self._epoch, idx))
        if self.augmentation:
            frames, flow = self.augmentation(frames, flow, rng2)
        if self.compression:
            frames, flow = self.compression(frames, flow, rng2)
        return frames[0], frames[1], flow
