"""ctypes bindings for the native data-loader core (libvsrio).

The C++ library (vsrlab_tpu/native/vsrio.cpp) does the host-side hot
work — threaded frame decode, batch bicubic resize, JPEG degradation —
directly into preallocated numpy buffers. If the shared library is
missing it is built on demand with ``make``; if that fails, callers fall
back to the pure-python cv2 paths (every entry point here has one).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[1] / "native"
_LIB_PATH = _NATIVE_DIR / "libvsrio.so"
_lib = None
_tried = False
_load_lock = threading.Lock()


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _load_lock:
        return _load_locked()


def _load_locked() -> Optional[ctypes.CDLL]:
    """Build+dlopen under ``_load_lock``: concurrent first calls from
    loader worker threads must not race `make` against a half-written
    .so (check-then-act was unlocked before)."""
    global _lib, _tried
    if _lib is not None or _tried:  # another thread won the race
        return _lib
    _tried = True
    try:
        # always invoke make: it is an incremental no-op when the .so is
        # current, and rebuilds a stale one after vsrio.cpp edits (the
        # old exists()-gate could dlopen an outdated binary forever)
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        if not _LIB_PATH.exists():
            return None  # no compiler and no prebuilt library
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    lib.vsrio_decode_clip.restype = ctypes.c_int
    lib.vsrio_decode_clip.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.vsrio_bicubic_resize.restype = None
    lib.vsrio_bicubic_resize.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.vsrio_jpeg_degrade.restype = None
    lib.vsrio_jpeg_degrade.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    if hasattr(lib, "vsrio_codec_degrade"):
        lib.vsrio_codec_degrade.restype = None
        lib.vsrio_codec_degrade.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_clip(
    paths: Sequence, height: int = 0, width: int = 0, threads: int = 8
) -> Optional[np.ndarray]:
    """Decode image files into (T, H, W, 3) float32 RGB in one native call.
    Returns None when the native library is unavailable (caller falls
    back); raises on decode failure."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    if height <= 0 or width <= 0:
        import cv2

        probe = cv2.imread(str(paths[0]), cv2.IMREAD_COLOR)
        if probe is None:
            raise IOError(f"cannot decode image: {paths[0]}")
        height, width = probe.shape[:2]
    out = np.empty((n, height, width, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    rc = lib.vsrio_decode_clip(arr, n, _fptr(out), height, width, threads)
    if rc:
        raise IOError(f"cannot decode image: {paths[rc - 1]}")
    return out


def bicubic_resize(clip: np.ndarray, out_h: int, out_w: int, threads: int = 8):
    """(T, H, W, 3) float32 -> (T, out_h, out_w, 3), clamped to [0, 1]."""
    lib = _load()
    if lib is None:
        return None
    clip = np.ascontiguousarray(clip, np.float32)
    t, h, w, _ = clip.shape
    out = np.empty((t, out_h, out_w, 3), np.float32)
    lib.vsrio_bicubic_resize(_fptr(clip), t, h, w, _fptr(out), out_h, out_w, threads)
    return out


def jpeg_degrade(clip: np.ndarray, quality: int, threads: int = 8):
    """JPEG round-trip on a (T, H, W, 3) float32 clip."""
    lib = _load()
    if lib is None:
        return None
    clip = np.ascontiguousarray(np.clip(clip, 0.0, 1.0), np.float32)
    t, h, w, _ = clip.shape
    out = np.empty_like(clip)
    lib.vsrio_jpeg_degrade(_fptr(clip), t, h, w, int(quality), _fptr(out), threads)
    return out


def codec_degrade(
    clip: np.ndarray,
    quality: float,
    gop: int = 8,
    subsample_chroma: bool = True,
    threads: int = 4,
):
    """Native DCT-residual codec round-trip (port of
    data/codec_emulator.dct_codec_roundtrip). Returns None when the
    native library is unavailable or lacks the symbol (older .so —
    callers fall back to the numpy path)."""
    lib = _load()
    if lib is None or not hasattr(lib, "vsrio_codec_degrade"):
        return None
    clip = np.ascontiguousarray(clip, np.float32)
    t, h, w, _ = clip.shape
    out = np.empty_like(clip)
    lib.vsrio_codec_degrade(
        _fptr(clip), t, h, w, float(quality), int(gop),
        1 if subsample_chroma else 0, _fptr(out), threads,
    )
    return out
