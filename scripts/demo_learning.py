"""Learning-quality demonstration: train on-chip until the model beats
bicubic upsampling by a clear margin.

The e2e trainer tests assert that losses decrease; this script closes
the remaining "does the full stack actually LEARN super-resolution?"
question without needing REDS/Vimeo on disk (externally blocked,
docs/roadmap.md #6): it trains RealBasicVSR on the procedural
SyntheticVSR data (true bicubic LR — data/datasets.py) and reports the
final val PSNR against the bicubic-upsample baseline PSNR on the SAME
val clips. A real SR model must clear bicubic by several dB.

Usage (TPU, ~10 min default):
    python scripts/demo_learning.py [--epochs 60] [--mid 32] [--blocks 5]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time

sys.path.insert(0, ".")


def bicubic_baseline(val_ds) -> float:
    """Mean PSNR of bicubic 4x upsampling over the val clips."""
    import cv2
    import numpy as np

    from vsrlab_tpu.core.metrics import psnr

    vals = []
    for i in range(len(val_ds)):
        lr, hr = val_ds[i]
        up = np.stack(
            [
                cv2.resize(
                    f, (hr.shape[2], hr.shape[1]),
                    interpolation=cv2.INTER_CUBIC,
                )
                for f in lr
            ]
        )
        vals.append(float(psnr(np.clip(up, 0, 1), hr)))
    return float(np.mean(vals))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--mid", type=int, default=32, help="mid_channels")
    ap.add_argument("--blocks", type=int, default=5, help="res_blocks")
    ap.add_argument("--videos", type=int, default=256)
    ap.add_argument(
        "--freq-max", type=float, default=0.11,
        help="max grating frequency (cycles/HR-px); below the 4x-LR "
        "Nyquist of 0.125 the content is recoverable, so a working SR "
        "model must clearly beat bicubic",
    )
    ap.add_argument("--size", type=int, default=48, help="LR crop size")
    ap.add_argument("--seq", type=int, default=4)
    ap.add_argument("--ema", type=float, default=0.99)
    args = ap.parse_args()

    from vsrlab_tpu.core.config import load_config
    from vsrlab_tpu.data.datasets import SyntheticVSR
    from vsrlab_tpu.train.train import run
    from vsrlab_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    ds_over = (
        f"num_videos={args.videos},seq={args.seq},"
        f"height={args.size},width={args.size}"
    )
    with tempfile.TemporaryDirectory() as tmp:
        cfg = load_config(
            overrides=[
                "+experiment=synthetic",
                f"core.storage_dir={tmp}",
                f"train.logger.save_dir={tmp}/logs",
                "train.ddp=false",
                "train.data.num_workers=0",
                f"train.model.mid_channels={args.mid}",
                f"train.model.res_blocks={args.blocks}",
                "train.model.cleaning_blocks=2",
                f"train.max_epochs={args.epochs}",
                f"train.ema_decay={args.ema}",
                "train.eval_every=10",
                f"train.data.datasets.train.num_videos={args.videos}",
                f"train.data.datasets.train.seq={args.seq}",
                f"train.data.datasets.train.height={args.size}",
                f"train.data.datasets.train.width={args.size}",
                f"train.data.datasets.train.freq_max={args.freq_max}",
                "train.data.datasets.val.num_videos=8",
                f"train.data.datasets.val.seq={args.seq}",
                f"train.data.datasets.val.height={args.size}",
                f"train.data.datasets.val.width={args.size}",
                f"train.data.datasets.val.freq_max={args.freq_max}",
            ]
        )
        val_ds = SyntheticVSR(
            num_videos=8, seq=args.seq, height=args.size, width=args.size,
            scale=4, split="val", freq_max=args.freq_max,
        )
        baseline = bicubic_baseline(val_ds)
        print(f"bicubic 4x baseline on val: {baseline:.2f} dB  ({ds_over})")

        t0 = time.time()
        final_val = run(cfg)
        dt = time.time() - t0

    gain = final_val["PSNR"] - baseline
    print(
        f"model val PSNR after {args.epochs} epochs ({dt / 60:.1f} min): "
        f"{final_val['PSNR']:.2f} dB  ->  {gain:+.2f} dB vs bicubic"
    )
    # measured 2026-08: +3.32 dB after 60 epochs / 2.1 min on one v5e
    assert gain > 2.0, f"model failed to clearly beat bicubic ({gain:+.2f} dB)"


if __name__ == "__main__":
    main()
