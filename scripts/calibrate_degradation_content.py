"""Content-dependence of the codec-emulator calibration (VERDICT r2 #7).

The crf→quality fit in docs/degradation_calibration.md was measured on
one natural-texture clip. This sweeps the SAME mapping over three
content classes — flat/cartoon, natural texture, high motion — and
records the PSNR spread per CRF so the fit's content variance is bounded
rather than assumed. Reference behavior being emulated:
/root/reference/src/core/augmentations.py:41-71 (PyAV x264 round-trip).

Run: python scripts/calibrate_degradation_content.py
"""

from __future__ import annotations

import sys

import cv2
import numpy as np

sys.path.insert(0, ".")

from vsrlab_tpu.data.codec_emulator import (  # noqa: E402
    crf_to_quality,
    dct_codec_roundtrip,
)

T, H, W = 10, 144, 176


def clip_flat(seed=0):
    """Cartoon-like: posterized smooth regions + hard edges, slow pan."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = 0.5 + 0.5 * np.sin(xx / 40.0) * np.cos(yy / 30.0)
    base = np.round(base * 4) / 4  # 5 flat levels
    frames = []
    for i in range(T):
        m = np.float32([[1, 0, i * 0.5], [0, 1, 0]])
        f = cv2.warpAffine(base, m, (W, H), borderMode=cv2.BORDER_REFLECT)
        rect = np.zeros_like(f)
        rect[40:90, 50 + i : 110 + i] = 0.8
        frames.append(np.clip(np.stack([f, 1 - f, rect], -1), 0, 1))
    return np.stack(frames).astype(np.float32)


def clip_texture(seed=0):
    """Natural-ish texture (same construction as calibrate_degradation)."""
    rng = np.random.default_rng(seed)
    base = rng.random((H // 8, W // 8, 3)).astype(np.float32)
    texture = cv2.resize(base, (W, H), interpolation=cv2.INTER_CUBIC)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    frames = []
    for i in range(T):
        phase = 2 * np.pi * i / T
        g = 0.5 + 0.25 * np.sin(xx / 17.0 + phase) * np.cos(yy / 23.0 - phase)
        f = np.clip(0.6 * texture + 0.4 * g[..., None], 0, 1)
        m = np.float32([[1, 0, i * 0.7], [0, 1, i * 0.4]])
        f = cv2.warpAffine(f, m, (W, H), borderMode=cv2.BORDER_REFLECT)
        frames.append(f.astype(np.float32))
    return np.stack(frames)


def clip_motion(seed=0):
    """High motion: fine texture with ~6 px/frame displacement + jitter."""
    rng = np.random.default_rng(seed)
    big = rng.random((H + 80, W + 80, 3)).astype(np.float32)
    big = cv2.GaussianBlur(big, (0, 0), 1.2)
    frames = []
    for i in range(T):
        dx = int(6 * i + 2 * np.sin(i))
        dy = int(4 * i)
        f = big[dy % 60 : dy % 60 + H, dx % 60 : dx % 60 + W]
        frames.append(np.clip(f, 0, 1))
    return np.stack(frames)


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def main():
    classes = {
        "flat/cartoon": clip_flat(),
        "natural texture": clip_texture(),
        "high motion": clip_motion(),
    }
    crfs = [18, 23, 28, 34, 40, 51]
    print("| crf | quality | " + " | ".join(classes) + " | spread (dB) |")
    print("|---|---|" + "---|" * (len(classes) + 1))
    slopes = {}
    for name in classes:
        slopes[name] = []
    rows = []
    for crf in crfs:
        q = crf_to_quality(crf)
        vals = []
        for name, clip in classes.items():
            out = dct_codec_roundtrip(clip, q, gop=8)
            p = psnr(clip, out)
            vals.append(p)
            slopes[name].append(p)
        spread = max(vals) - min(vals)
        rows.append((crf, q, vals, spread))
        print(
            f"| {crf} | {q:.1f} | "
            + " | ".join(f"{v:.2f}" for v in vals)
            + f" | {spread:.2f} |"
        )
    # per-class slope over the training band (crf 18..34)
    print()
    for name, ps in slopes.items():
        slope = (ps[3] - ps[0]) / (34 - 18)
        print(f"slope {name}: {slope:+.3f} dB/crf (crf 18→34)")


if __name__ == "__main__":
    main()
