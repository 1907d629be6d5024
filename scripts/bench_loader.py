"""Host data-pipeline throughput (SURVEY.md §7.3 hard part #5).

The reference's training bottleneck risk is the host-side decode +
degradation pipeline (PyAV H.264 re-encode per sample,
src/core/augmentations.py:48-71; the reference even disables pin_memory,
src/core/utils.py:219,230). This bench answers the TPU-side question:
can our threaded loader keep the chip fed?

Demand: the measured supervised train step at the bench shape is
~215 ms for a batch of 4 six-frame crops (docs/tpu_kernel_notes.md)
=> ~18.6 clips/s.

Measures, on synthetic 720p frame folders:
(1) per-clip CPU cost of ``dataset[i]`` (single-threaded, pure pipeline
    cost) for (a) decode + random crop/flip + bicubic /4 (the `basic`
    experiment path) and (b) (a) + the full RealBasicVSR degradation
    (JPEG + calibrated codec emulator) on the LR side — from which the
    host cores needed to meet the chip's demand follow directly;
(2) DataLoader end-to-end clips/s. NOTE: this box exposes ONE host CPU
    core (nproc=1), so multi-worker scaling CANNOT be demonstrated here
    — workers only add contention. The workers sweep is meaningful only
    on a multi-core host; per-clip cost is the portable number.

Run: python scripts/bench_loader.py [--videos 4] [--frames 20] [--workers 1 2]
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tempfile
import time
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, ".")

from vsrlab_tpu.data import DataLoader, DatasetVSR  # noqa: E402


def synth_frame(h: int, w: int, t: int, vid: int) -> np.ndarray:
    """Smooth synthetic 720p content (compresses like video, not noise)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 0.5 + 0.5 * np.sin(xx / 97.0 + vid) * np.cos(yy / 61.0)
    cx, cy = w / 2 + 80 * np.sin(t / 3.0), h / 2 + 60 * np.cos(t / 4.0)
    blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 90.0**2)))
    g = np.clip(base * 0.7 + blob, 0, 1)
    frame = np.stack([g, np.roll(g, 30, 1), 1.0 - g], -1)
    return (frame * 255).astype(np.uint8)


def make_dataset(root: Path, videos: int, frames: int, h=720, w=1280):
    for v in range(videos):
        d = root / f"{v:03d}"
        d.mkdir(parents=True)
        for t in range(frames):
            cv2.imwrite(str(d / f"{t:08d}.png"), synth_frame(h, w, t, v))


def bench(dataset, batch_size: int, workers: int, min_batches=8) -> float:
    loader = DataLoader(
        dataset, batch_size=batch_size, num_workers=workers, drop_last=True
    )
    it = iter(loader)
    next(it)  # warm the pool / page cache
    n, t0 = 0, time.perf_counter()
    epoch = 0
    while n < min_batches:
        for batch in it:
            n += 1
            if n >= min_batches:
                break
        else:
            epoch += 1
            loader.set_epoch(epoch)
            it = iter(loader)
    dt = time.perf_counter() - t0
    return n * batch_size / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=4)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2])
    args = ap.parse_args()

    root = Path(tempfile.mkdtemp(prefix="vsr_loader_bench_"))
    try:
        print(f"writing {args.videos}x{args.frames} synthetic 720p frames ...")
        make_dataset(root, args.videos, args.frames)

        hr_aug = [
            {"_target_": "RandomCrop", "size": 256},
            {"_target_": "RandomFlip"},
        ]
        degrade = [
            {"_target_": "Resize", "scale": 0.25},
            {"_target_": "RandomJPEGCompression", "quality": (30, 95)},
            {"_target_": "RandomVideoCompression", "crf": (18, 35)},
        ]
        configs = {
            "bicubic": dict(hr_augmentation=hr_aug, lr_augmentation=None),
            "degraded": dict(hr_augmentation=hr_aug, lr_augmentation=degrade),
        }
        demand = 18.6  # clips/s: 215 ms train step / batch 4 (kernel notes)
        for name, kw in configs.items():
            ds = DatasetVSR(str(root), split="train", seq=6, train_size=1.0, **kw)
            # (1) pure per-clip pipeline cost, single-threaded
            ds[0]  # warm page cache / native lib
            t0 = time.perf_counter()
            n_items = 8
            for i in range(n_items):
                ds[i % len(ds)]
            per_clip = (time.perf_counter() - t0) / n_items
            print(
                f"{name:>9}: {per_clip*1e3:7.1f} ms/clip single-threaded "
                f"-> {demand * per_clip:.1f} cores to feed one v5e chip "
                f"at {demand} clips/s"
            )
            # (2) loader end-to-end (contention-bound on this 1-core box)
            for nw in args.workers:
                cps = bench(ds, args.batch, nw)
                print(f"{name:>9}: loader workers={nw}: {cps:.1f} clips/s")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
