"""Video file read/write/compress utilities.

Capability parity with the reference's PyAV helpers
(src/core/augmentations.py:73-115): read a video file to frames, write
frames to an encoded file, and build compressed-LR copies of a folder of
HR videos. Backed by OpenCV's FFmpeg bindings (PyAV is not installed);
this box ships MPEG-4 part-2 encoders (mp4v), so requested H.264 codecs
map onto mp4v with crf translated to the encoder quality scale.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

_FOURCC = {"mp4v": "mp4v", "xvid": "XVID", "libx264": "mp4v", "h264": "mp4v"}


def read_video(path) -> Tuple[np.ndarray, str, float, int, int]:
    """Decode a video file.

    Returns (frames (T, H, W, 3) float32 RGB [0,1], codec, fps, height, width)
    — the reference's tuple shape (augmentations.py:73-86).
    """
    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        raise IOError(f"not a video: {path}")
    fps = cap.get(cv2.CAP_PROP_FPS)
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    fourcc = int(cap.get(cv2.CAP_PROP_FOURCC))
    codec = "".join(chr((fourcc >> (8 * i)) & 0xFF) for i in range(4)).strip()
    frames: List[np.ndarray] = []
    while True:
        ok, img = cap.read()
        if not ok:
            break
        frames.append(img[..., ::-1].astype(np.float32) / 255.0)
    cap.release()
    return np.stack(frames), codec, fps, h, w


def video_frame_count(path) -> int:
    """Frame count from the container header (no decode)."""
    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        raise IOError(f"not a video: {path}")
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    return n


def read_video_window(path, start: int, count: int) -> np.ndarray:
    """Decode ``count`` frames starting at frame ``start``.

    Seeks via CAP_PROP_POS_FRAMES so random-window training from video
    FILES (``VideoDatasetVSR``) decodes only the sampled clip, not the
    whole video. Returns (count, H, W, 3) float32 RGB in [0, 1].
    """
    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        raise IOError(f"not a video: {path}")
    try:
        s = int(start)
        while True:
            if s:
                cap.set(cv2.CAP_PROP_POS_FRAMES, s)
            frames: List[np.ndarray] = []
            for _ in range(count):
                ok, img = cap.read()
                if not ok:
                    break
                frames.append(img[..., ::-1].astype(np.float32) / 255.0)
            if frames or s == 0:
                break
            # header frame counts can over-report (VFR/estimated-index
            # containers), so a sampled tail window may land past the
            # last decodable frame: walk the seek back toward 0 instead
            # of killing the training run over one unlucky draw
            s //= 2
    finally:
        cap.release()
    if len(frames) < count:
        if not frames:
            raise IOError(f"no decodable frames in {path}")
        # short read at EOF: repeat the last frame
        while len(frames) < count:
            frames.append(frames[-1])
    return np.stack(frames)


class SequentialVideoReader:
    """Decode a video file window by window, keeping ONE open container
    (no per-window seek). Streams arbitrarily long videos at O(window)
    host memory — the building block of the pipelined ``upscale`` CLI."""

    def __init__(self, path):
        self._cap = cv2.VideoCapture(str(path))
        if not self._cap.isOpened():
            raise IOError(f"not a video: {path}")
        self.fps = self._cap.get(cv2.CAP_PROP_FPS)
        self.height = int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.width = int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH))

    def read(self, count: int) -> np.ndarray:
        """Next ``count`` frames as (k, H, W, 3) float32 RGB in [0, 1];
        ``k < count`` at EOF (possibly 0)."""
        frames: List[np.ndarray] = []
        for _ in range(count):
            ok, img = self._cap.read()
            if not ok:
                break
            frames.append(img[..., ::-1].astype(np.float32) / 255.0)
        if not frames:
            return np.zeros((0, self.height, self.width, 3), np.float32)
        return np.stack(frames)

    def close(self):
        self._cap.release()


def open_video_writer(path, width: int, height: int, codec: str = "mp4v",
                      fps: float = 24.0, crf: int = 23) -> "cv2.VideoWriter":
    """Open an encoder for incremental writes (frames appended as they
    are produced — O(window) host memory for long outputs)."""
    fourcc = cv2.VideoWriter_fourcc(*_FOURCC.get(codec.lower(), "mp4v"))
    writer = cv2.VideoWriter(str(path), fourcc, float(fps), (width, height))
    if not writer.isOpened():
        raise IOError(f"cannot open encoder for: {path}")
    writer.set(cv2.VIDEOWRITER_PROP_QUALITY, max(1.0, 100.0 - crf * 2.0))
    return writer


def write_frames(writer, frames: np.ndarray):
    """Append (T, H, W, 3) float32 RGB [0,1] frames to an open writer."""
    for f in frames:
        u8 = np.clip(np.rint(np.clip(f, 0, 1) * 255), 0, 255).astype(np.uint8)
        writer.write(u8[..., ::-1])


def write_video(path, frames: np.ndarray, codec: str = "mp4v",
                fps: float = 24.0, crf: int = 23):
    """Encode (T, H, W, 3) float32 frames to a video file
    (reference augmentations.py:88-105); crf maps to encoder quality."""
    t, h, w, _ = frames.shape
    writer = open_video_writer(path, w, h, codec, fps, crf)
    write_frames(writer, frames)
    writer.release()


def compress_video(path_hr, path_lr, crf: int, scale_factor: int):
    """Downscale ÷scale_factor + re-encode at crf
    (reference augmentations.py:107-112).

    cv2's encoder quality knob is a measured no-op on this stack
    (docs/degradation_calibration.md: identical bytes at every
    VIDEOWRITER_PROP_QUALITY), so crf severity is applied to the FRAMES
    via the calibrated DCT-residual codec emulator before encoding —
    the same mechanism the training-time degradation pipeline uses.
    File size is still not rate-controlled; the visual severity is.
    """
    from vsrlab_tpu.data.codec_emulator import (
        crf_to_quality,
        dct_codec_roundtrip,
    )

    frames, codec, fps, h, w = read_video(path_hr)
    assert h % scale_factor == 0, f"{h=} not divisible by {scale_factor}"
    assert w % scale_factor == 0, f"{w=} not divisible by {scale_factor}"
    small = np.stack(
        [
            cv2.resize(f, (w // scale_factor, h // scale_factor),
                       interpolation=cv2.INTER_AREA)
            for f in frames
        ]
    )
    if crf > 0:
        small = dct_codec_roundtrip(small, quality=crf_to_quality(crf))
    write_video(path_lr, small, codec="mp4v", fps=fps, crf=crf)


def compress_video_folder(folder, crf: int, scale_factor: int):
    """Build ``<folder>/lr_crf_<crf>/`` from ``<folder>/hr/*``
    (reference augmentations.py:114-115 — fixed to be idempotent)."""
    out = Path(folder) / f"lr_crf_{crf}"
    out.mkdir(exist_ok=True)
    for video in sorted(Path(folder).glob("hr/*")):
        compress_video(str(video), str(out / video.name), crf, scale_factor)
