"""VSR datasets: frame-folder clips with on-the-fly degradation.

Capability parity with the reference (src/vsr/dataset.py:16-105):

* :class:`DatasetVSR` — a directory of videos (each a folder of frames);
  a random ``seq``-frame window is drawn per sample; HR augmentation
  pipeline from config; LR is either the configured degradation pipeline
  or a bicubic ÷scale downscale; in-file train/val split by fraction.
* :class:`ValDatasetVSR` — paired pre-generated HR/LR folders, same
  random window applied to both.
* :class:`SyntheticVSR` — procedurally-generated moving-pattern clips
  (no disk, deterministic per index); keeps trainers/benches runnable on
  machines with no datasets and doubles as the test fixture.

Samples are ``(lr, hr)`` float32 numpy clips ``(T, H, W, C)`` in [0, 1].
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional, Sequence

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

from vsrlab_tpu.data import native
from vsrlab_tpu.data.augmentations import build_pipeline


def load_frame(path) -> np.ndarray:
    """Decode one image file to float32 RGB (H, W, 3) in [0, 1]."""
    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if img is None:
        raise IOError(f"cannot decode image: {path}")
    return img[..., ::-1].astype(np.float32) / 255.0


def load_clip(paths) -> np.ndarray:
    """Decode a list of frame files to (T, H, W, 3) float32 — native
    threaded C++ decode when libvsrio is available, cv2 otherwise."""
    clip = native.decode_clip(paths)
    if clip is not None:
        return clip
    return np.stack([load_frame(p) for p in paths])


def _bicubic_down(clip: np.ndarray, scale: int) -> np.ndarray:
    t, h, w, c = clip.shape
    out = native.bicubic_resize(clip, h // scale, w // scale)
    if out is not None:
        return out
    frames = [
        cv2.resize(
            f, (w // scale, h // scale), interpolation=cv2.INTER_CUBIC
        )
        for f in clip
    ]
    return np.clip(np.stack(frames), 0.0, 1.0)


class DatasetVSR:
    """Folder-of-videos dataset (reference src/vsr/dataset.py:16-65)."""

    def __init__(
        self,
        path: str,
        split: str = "train",
        seq: int = 6,
        train_size: float = 0.8,
        scale: int = 4,
        hr_augmentation: Optional[Sequence] = None,
        lr_augmentation: Optional[Sequence] = None,
        seed: int = 0,
        **_,
    ):
        self.videos = self._list_videos(path)
        split_point = int(len(self.videos) * train_size)
        if split == "train":
            self.videos = self.videos[:split_point]
        elif split == "val":
            self.videos = self.videos[split_point:]
        self.seq = seq
        self.scale = scale
        self.hr_aug = build_pipeline(hr_augmentation)
        self.lr_aug = build_pipeline(lr_augmentation)
        self.seed = seed
        self._epoch = 0

    def _list_videos(self, path):
        """One entry per video; subclasses override the storage layout."""
        return sorted(p for p in Path(path).glob("*") if p.is_dir())

    def _read_window(self, index: int, rng: np.random.Generator) -> np.ndarray:
        """A random ``seq``-frame HR window of video ``index``."""
        frames = sorted(x for x in self.videos[index].glob("*") if x.is_file())
        start = int(rng.integers(0, max(len(frames) - self.seq, 0) + 1))
        return load_clip(frames[start : start + self.seq])

    def set_epoch(self, epoch: int):
        """Reseed per-epoch randomness (window choice, augment severity)."""
        self._epoch = epoch

    def __len__(self) -> int:
        return len(self.videos)

    def _rng(self, index: int) -> np.random.Generator:
        return np.random.default_rng((self.seed, self._epoch, index))

    def __getitem__(self, index: int):
        rng = self._rng(index)
        hr = self._read_window(index, rng)

        if self.hr_aug:
            hr = self.hr_aug(hr, rng)
        if self.lr_aug:
            lr = self.lr_aug(hr, rng)
        else:
            lr = _bicubic_down(hr, self.scale)
        return lr, hr


class ValDatasetVSR:
    """Paired HR/LR folders (reference src/vsr/dataset.py:67-105)."""

    def __init__(
        self,
        path_hr: str,
        path_lr: str,
        seq: int = 6,
        hr_augmentation: Optional[Sequence] = None,
        lr_augmentation: Optional[Sequence] = None,
        seed: int = 0,
        **_,
    ):
        self.videos_hr = sorted(p for p in Path(path_hr).glob("*") if p.is_dir())
        self.videos_lr = sorted(p for p in Path(path_lr).glob("*") if p.is_dir())
        self.seq = seq
        self.hr_aug = build_pipeline(hr_augmentation)
        self.lr_aug = build_pipeline(lr_augmentation)
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __len__(self) -> int:
        return len(self.videos_hr)

    def __getitem__(self, index: int):
        rng = np.random.default_rng((self.seed, self._epoch, index))
        hr_frames = sorted(
            x for x in self.videos_hr[index].glob("*") if x.is_file()
        )
        lr_frames = sorted(
            x for x in self.videos_lr[index].glob("*") if x.is_file()
        )
        start = int(rng.integers(0, max(len(hr_frames) - self.seq, 0) + 1))
        hr = load_clip(hr_frames[start : start + self.seq])
        lr = load_clip(lr_frames[start : start + self.seq])
        # paired pipelines must see IDENTICAL random draws, or stochastic
        # geometric transforms (flips/rotations) misalign the lr/hr pair:
        # clone the generator state for each branch instead of consuming
        # one generator sequentially (per-call severity sampling is the
        # round-2 fix of reference bug SURVEY.md §7.4 — this keeps it
        # while preserving the reference's pair alignment,
        # src/vsr/dataset.py:67-105)
        seed_tuple = (self.seed, self._epoch, index, 1)
        if self.hr_aug:
            hr = self.hr_aug(hr, np.random.default_rng(seed_tuple))
        if self.lr_aug:
            lr = self.lr_aug(lr, np.random.default_rng(seed_tuple))
        return lr, hr


class VideoDatasetVSR(DatasetVSR):
    """Folder-of-video-FILES dataset: train straight from .mp4/.avi.

    Beyond the reference, whose ``DatasetVSR`` requires pre-extracted
    frame folders (src/vsr/dataset.py:16-65) — real deployment data
    usually arrives as encoded files. Same contract (split, per-epoch
    rng, augment pipelines, bicubic-LR fallback — all inherited); only
    the storage layout differs: one encoded FILE per video, and only the
    sampled window is decoded (``video_io.read_video_window`` container
    seek, not a full decode).
    """

    EXTS = {".mp4", ".avi", ".mkv", ".mov", ".webm"}

    def __init__(self, *args, **kwargs):
        self._counts: dict = {}
        super().__init__(*args, **kwargs)

    def _list_videos(self, path):
        return sorted(
            p
            for p in Path(path).glob("*")
            if p.is_file() and p.suffix.lower() in self.EXTS
        )

    def _count(self, path) -> int:
        from vsrlab_tpu.data.video_io import video_frame_count

        if path not in self._counts:
            self._counts[path] = video_frame_count(path)
        return self._counts[path]

    def _read_window(self, index: int, rng: np.random.Generator) -> np.ndarray:
        from vsrlab_tpu.data.video_io import read_video_window

        path = self.videos[index]
        n = self._count(path)
        start = int(rng.integers(0, max(n - self.seq, 0) + 1))
        return read_video_window(path, start, self.seq)


class SyntheticVSR:
    """Procedural moving-gradient clips — deterministic per (seed, index).

    LR is a true bicubic downscale of HR, so PSNR/SSIM behave like real
    data; optional degradation pipeline applies on top.
    """

    def __init__(
        self,
        num_videos: int = 32,
        seq: int = 6,
        height: int = 64,
        width: int = 64,
        scale: int = 4,
        lr_augmentation: Optional[Sequence] = None,
        seed: int = 0,
        split: str = "train",
        freq_max: float = 0.2,
        **_,
    ):
        self.n = num_videos
        self.seq = seq
        self.h, self.w = height, width
        self.scale = scale
        self.lr_aug = build_pipeline(lr_augmentation)
        self.seed = seed + (1000 if split == "val" else 0)
        # default 0.2 exceeds the 4x-LR Nyquist (1/(2*scale)=0.125), so some
        # clips carry aliased, unrecoverable gratings — fine for smoke tests;
        # learning demos should band-limit (e.g. 0.11) so SR is learnable
        self.freq_max = freq_max
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, index: int):
        rng = np.random.default_rng((self.seed, index))
        t, h, w = self.seq, self.h, self.w
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        fx, fy = rng.uniform(0.02, self.freq_max, 2)
        phase = rng.uniform(0, 2 * np.pi, 3)
        vx, vy = rng.uniform(-2, 2, 2)
        frames = []
        for i in range(t):
            base = np.stack(
                [
                    np.sin(2 * np.pi * (fx * (xx + vx * i)) + phase[c])
                    * np.cos(2 * np.pi * (fy * (yy + vy * i)) + phase[2 - c])
                    for c in range(3)
                ],
                axis=-1,
            )
            frames.append((base * 0.5 + 0.5).astype(np.float32))
        hr = np.stack(frames)
        if _HAS_CV2:
            lr = _bicubic_down(hr, self.scale)
        else:
            lr = hr.reshape(
                t, h // self.scale, self.scale, w // self.scale, self.scale, 3
            ).mean((2, 4))
        if self.lr_aug:
            lr = self.lr_aug(lr, np.random.default_rng((self.seed, self._epoch, index)))
        return lr, hr
