"""Direct video → video super-resolution CLI.

The user-facing serving surface the reference lacks (its ``src/test.py``
only runs the fps×crf evaluation-matrix protocol over prepared
directory trees): point this at one video file (or frame folder) and a
trained run directory, get the upscaled video (or PNG frames) out.

Composes the tested building blocks: checkpoint+config reload
(`harness.load_test_model`), windowed long-clip inference
(`harness.windowed_inference` — reference src/test.py:124-135), and the
official-VRT spatial tiling for inputs whose single-pass footprint
exceeds HBM (`tiled.tiled_forward`).

Usage::

    python -m vsrlab_tpu.evaluation.upscale \
        --cfg-dir <run-dir> --input clip.mp4 --output clip_4x.mp4 \
        [--window-size 10] [--tile 0] [--tile-overlap 16] [--fps auto] \
        [--align-chunks 0] [--stream]
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np

VIDEO_EXTS = {".mp4", ".avi", ".mkv", ".mov", ".webm"}


def upscale(
    cfg_dir: str,
    input_path: str,
    output_path: str,
    window_size: int = 10,
    tile: int = 0,
    tile_overlap: int = 16,
    fps: float = 0.0,
    codec: str = "mp4v",
    align_chunks: int = 0,
    stream: bool = False,
) -> tuple:
    """Upscale one video file or frame folder. Returns (out_shape, seconds)."""
    from vsrlab_tpu.data.video_io import read_video, write_video
    from vsrlab_tpu.evaluation.harness import (
        get_video,
        load_test_model,
        make_forward,
        make_stream_forward,
    )

    out = Path(output_path)
    to_video = out.suffix.lower() in VIDEO_EXTS
    if out.suffix and not to_video and not out.is_dir():
        raise ValueError(
            f"unrecognised output extension '{out.suffix}' — use one of "
            f"{sorted(VIDEO_EXTS)} for a video, or a directory path for "
            "PNG frames"
        )

    inp = Path(input_path)
    if inp.is_dir():
        clip = get_video(inp)  # (1, T, H, W, 3)
        src_fps = fps or 24.0
    else:
        frames, _codec, src_fps, _, _ = read_video(inp)
        clip = frames[None]
        src_fps = fps or src_fps

    model, params, _cfg = load_test_model(cfg_dir)
    if align_chunks and hasattr(model, "align_chunks"):
        # memory knob for single-pass large inputs (VRT family only):
        # chunked parallel-warping alignment, numerically identical
        # (docs/tpu_kernel_notes.md perf pass V) — lets e.g. full VRT at
        # 16x256x256 run single-pass (1.9 fps) instead of tiled (1.1)
        model = model.clone(align_chunks=align_chunks)
    if stream and not hasattr(model, "fuse_directions"):
        raise ValueError(
            "--stream needs a recurrent model (BasicVSR family); "
            f"{type(model).__name__} has no propagation state to carry"
        )
    if stream and tile:
        raise ValueError("--stream and --tile are mutually exclusive")
    forward = None if stream else make_forward(model, tile, tile_overlap)

    # windows run SEQUENTIALLY (unlike the harness's stacked batch, which
    # shards over a mesh time axis): device memory stays at one window
    # regardless of video length, and each window's SR streams back to
    # the host as the next one computes. With ``stream`` the forward
    # recurrence state is carried between windows (exactly equal to a
    # full-clip forward pass), so only the backward direction restarts
    # at window boundaries instead of both.
    _, t, h, w, c = clip.shape
    pad = (-t) % window_size
    clip_np = np.asarray(clip)
    if pad:
        clip_np = np.concatenate(
            [clip_np, np.repeat(clip_np[:, -1:], pad, axis=1)], axis=1
        )
    t0 = time.time()
    outs = []
    if stream:
        first, rest = make_stream_forward(model)
        state = None
        for i in range(0, clip_np.shape[1], window_size):
            win = jax.numpy.asarray(clip_np[:, i : i + window_size])
            sr_win, state = (
                first(params, win) if state is None
                else rest(params, win, state)
            )
            outs.append(np.asarray(jax.numpy.clip(sr_win[0], 0.0, 1.0)))
    else:
        for i in range(0, clip_np.shape[1], window_size):
            win = jax.numpy.asarray(clip_np[:, i : i + window_size])
            sr_win = forward(params, win)
            outs.append(np.asarray(jax.numpy.clip(sr_win[0], 0.0, 1.0)))
    sr = np.concatenate(outs, axis=0)[:t]
    dt = time.time() - t0

    if to_video:
        out.parent.mkdir(parents=True, exist_ok=True)
        write_video(out, sr, codec=codec, fps=src_fps)
    else:
        import cv2

        out.mkdir(parents=True, exist_ok=True)
        for i, frame in enumerate(sr):
            u8 = np.clip(np.rint(frame * 255), 0, 255).astype(np.uint8)
            cv2.imwrite(str(out / f"img{i:05d}.png"), u8[..., ::-1])
    return sr.shape, dt


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="video -> video SR")
    ap.add_argument("--cfg-dir", required=True, help="trained run directory")
    ap.add_argument("--input", required=True, help="video file or frame folder")
    ap.add_argument(
        "--output", required=True,
        help="output video file (by extension) or frame folder",
    )
    ap.add_argument("--window-size", type=int, default=10)
    ap.add_argument(
        "--tile", type=int, default=0,
        help="spatial tile size (official-VRT --tile protocol; 0 = single-pass)",
    )
    ap.add_argument("--tile-overlap", type=int, default=16)
    ap.add_argument("--fps", type=float, default=0.0, help="0 = keep source fps")
    ap.add_argument("--codec", default="mp4v")
    ap.add_argument(
        "--align-chunks", type=int, default=0,
        help="VRT memory knob: chunk the parallel-warping alignment so "
        "large windows run single-pass instead of tiled (e.g. 30 for "
        "16-frame 256px windows; numerically identical)",
    )
    ap.add_argument(
        "--stream", action="store_true",
        help="carry the forward recurrence state across windows "
        "(BasicVSR family): temporal continuity of a full-clip run at "
        "one-window memory, instead of resetting per window",
    )
    args = ap.parse_args(argv)

    shape, dt = upscale(
        args.cfg_dir, args.input, args.output, args.window_size,
        args.tile, args.tile_overlap, args.fps, args.codec,
        args.align_chunks, args.stream,
    )
    print(f"wrote {args.output}: {shape} in {dt:.1f}s "
          f"({shape[0] / max(dt, 1e-9):.2f} frames/s)")


if __name__ == "__main__":
    main()
