"""Direct video → video super-resolution CLI.

The user-facing serving surface the reference lacks (its ``src/test.py``
only runs the fps×crf evaluation-matrix protocol over prepared
directory trees): point this at one video file (or frame folder) and a
trained run directory, get the upscaled video (or PNG frames) out.

Composes the tested building blocks: checkpoint+config reload
(`harness.load_test_model`), per-window forwards (`harness.make_forward`,
which applies the official-VRT spatial tiling when ``--tile`` is set) or
the stateful streaming pair (`harness.make_stream_forward`), fed by a
pipelined decode→compute→encode loop (`SequentialVideoReader`,
`_iter_windows`, `_prefetch`) that holds one window of frames at a time —
the windowing protocol of reference src/test.py:124-135 at O(window)
memory for arbitrarily long videos.

Usage::

    python -m vsrlab_tpu.evaluation.upscale \
        --cfg-dir <run-dir> --input clip.mp4 --output clip_4x.mp4 \
        [--window-size 10] [--tile 0] [--tile-overlap 16] [--fps auto] \
        [--align-chunks 0] [--stream] [--raw-weights]

    # or serve a self-contained AOT artifact (no model code/checkpoint):
    python -m vsrlab_tpu.evaluation.upscale \
        --artifact model.jaxexp --input clip.mp4 --output clip_4x.mp4
"""

from __future__ import annotations

import queue
import threading
import time
from pathlib import Path

import jax
import numpy as np

VIDEO_EXTS = {".mp4", ".avi", ".mkv", ".mov", ".webm"}


def _iter_windows(read_next, window_size: int):
    """Yield ``(window (1, ws, H, W, 3), n_real)`` until the source is
    exhausted; a short final read is padded by repeating its last frame
    (``n_real`` says how many frames are real)."""
    while True:
        frames = read_next(window_size)
        k = 0 if frames is None else len(frames)
        if k == 0:
            return
        if k < window_size:
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], window_size - k, axis=0)]
            )
        yield frames[None], k


def _prefetch(gen, depth: int = 1):
    """Run a generator in a daemon thread with a bounded queue, so the
    NEXT window decodes while the device computes the current one (cv2
    decode releases the GIL).

    Closing the returned generator (or abandoning it on an exception)
    stops the worker and joins it BEFORE returning, so the caller may
    safely release resources the source generator reads from (e.g. the
    open cv2 capture) — releasing a capture while a worker thread sits
    inside ``read()`` is a native-level race."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END = object()

    def worker():
        try:
            for item in gen:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.05)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put(_END)
        except BaseException as e:  # surface decode errors to the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while t.is_alive():  # drain so a blocked put() can observe stop
            try:
                q.get_nowait()
            except queue.Empty:
                pass
            t.join(0.05)


class _VideoSink:
    """Incremental video encoder: frames append as windows drain."""

    def __init__(self, path, fps: float, codec: str):
        self.path, self.fps, self.codec = Path(path), fps, codec
        self._writer = None
        self.frames_written = 0
        self.frame_shape = None

    def write(self, frames: np.ndarray):
        from vsrlab_tpu.data.video_io import open_video_writer, write_frames

        if self._writer is None:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            h, w = frames.shape[1:3]
            self._writer = open_video_writer(
                self.path, w, h, self.codec, self.fps
            )
        write_frames(self._writer, frames)
        self.frames_written += len(frames)
        self.frame_shape = frames.shape[1:]

    def close(self):
        if self._writer is not None:
            self._writer.release()


class _FolderSink:
    """Incremental PNG frame dump."""

    def __init__(self, path):
        self.path = Path(path)
        self.path.mkdir(parents=True, exist_ok=True)
        self.frames_written = 0
        self.frame_shape = None

    def write(self, frames: np.ndarray):
        import cv2

        for frame in frames:
            u8 = np.clip(np.rint(frame * 255), 0, 255).astype(np.uint8)
            cv2.imwrite(
                str(self.path / f"img{self.frames_written:05d}.png"),
                u8[..., ::-1],
            )
            self.frames_written += 1
        self.frame_shape = frames.shape[1:]

    def close(self):
        pass


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
    use_ema: bool = True,
    artifact: str = "",
) -> tuple:
    """Upscale one video file or frame folder. Returns (out_shape, seconds).

    The loop is fully pipelined at O(window) memory in the video length:
    the source decodes window ``i+1`` in a background thread while the
    device computes window ``i`` (async dispatch) and the host encodes
    window ``i-1`` — decode, SR, and encode all overlap.
    """
    from vsrlab_tpu.data.datasets import load_frame
    from vsrlab_tpu.data.video_io import SequentialVideoReader
    from vsrlab_tpu.evaluation.harness import (
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

    expect_hw = None
    if artifact:
        # serve a self-contained AOT artifact (evaluation/export.py):
        # fixed-shape StableHLO graph with the weights baked in — no
        # model code, config snapshot, or checkpoint needed
        if stream or tile or align_chunks:
            raise ValueError(
                "--artifact serves a fixed-shape AOT graph; --stream/"
                "--tile/--align-chunks need the model code (use --cfg-dir)"
            )
        from vsrlab_tpu.evaluation.export import load_exported_forward

        aot_fwd, in_aval = load_exported_forward(artifact)
        if in_aval.shape[0] != 1:
            raise ValueError(
                f"artifact was exported at batch={in_aval.shape[0]}; the "
                "upscale loop feeds single-clip windows (re-export with "
                "--batch 1)"
            )
        if window_size != in_aval.shape[1]:
            print(
                f"note: window size is fixed at export time — using the "
                f"artifact's {in_aval.shape[1]} (not {window_size})"
            )
            window_size = int(in_aval.shape[1])
        expect_hw = (int(in_aval.shape[2]), int(in_aval.shape[3]))
        params = None

        def forward(_params, clip):
            return aot_fwd(clip.astype(in_aval.dtype))

    else:
        model, params, _cfg = load_test_model(cfg_dir, use_ema=use_ema)
        if align_chunks and hasattr(model, "align_chunks"):
            # memory knob for single-pass large inputs (VRT family only):
            # chunked parallel-warping alignment, numerically identical
            # (docs/tpu_kernel_notes.md perf pass V) — lets e.g. full VRT
            # at 16x256x256 run single-pass (1.9 fps) instead of tiled (1.1)
            model = model.clone(align_chunks=align_chunks)
        if stream and not hasattr(model, "fuse_directions"):
            raise ValueError(
                "--stream needs a recurrent model (BasicVSR family); "
                f"{type(model).__name__} has no propagation state to carry"
            )
        if stream and tile:
            raise ValueError("--stream and --tile are mutually exclusive")
        forward = None if stream else make_forward(model, tile, tile_overlap)

    # open the input only after every validation that can raise, so an
    # invalid flag combination doesn't leak the native decoder context
    inp = Path(input_path)
    reader = None
    if inp.is_dir():
        frame_files = sorted(p for p in inp.iterdir() if p.is_file())
        if not frame_files:
            raise IOError(f"no frames in {inp}")
        pos = 0

        def read_next(n):
            nonlocal pos
            batch = frame_files[pos : pos + n]
            pos += len(batch)
            if not batch:
                return None
            return np.stack([load_frame(p) for p in batch])

        src_fps = fps or 24.0
    else:
        reader = SequentialVideoReader(inp)
        read_next = reader.read
        # some containers carry no fps metadata (cv2 reports 0.0) — fall
        # back like the frame-folder path so the encoder can still open
        src_fps = fps or reader.fps or 24.0

    # windows run SEQUENTIALLY (unlike the harness's stacked batch, which
    # shards over a mesh time axis) and the three stages overlap: a
    # background thread decodes window i+1, the device computes window i
    # (dispatch is async), and the host reads back + encodes window i-1 —
    # one-window lag, so the readback never blocks the next dispatch.
    # Host AND device memory stay at one window regardless of video
    # length. With ``stream`` the forward recurrence state is carried
    # between windows (exactly equal to a full-clip forward pass), so
    # only the backward direction restarts at window boundaries.
    if stream:
        first, rest = make_stream_forward(model)
    sink = (
        _VideoSink(out, src_fps, codec) if to_video else _FolderSink(out)
    )
    t0 = time.time()
    state = None
    pending = None  # (device SR array, n_real) — one window behind
    windows = _prefetch(_iter_windows(read_next, window_size))
    try:
        for win_np, n_real in windows:
            if expect_hw and win_np.shape[2:4] != expect_hw:
                raise ValueError(
                    f"input frames are {win_np.shape[2]}x{win_np.shape[3]} "
                    f"but the artifact was exported at "
                    f"{expect_hw[0]}x{expect_hw[1]} (fixed shape)"
                )
            win = jax.numpy.asarray(win_np)
            if stream:
                sr_win, state = (
                    first(params, win) if state is None
                    else rest(params, win, state)
                )
            else:
                sr_win = forward(params, win)
            sr_dev = jax.numpy.clip(sr_win[0], 0.0, 1.0)  # lazy, on device
            if pending is not None:
                prev, k = pending
                sink.write(np.asarray(prev)[:k])
            pending = (sr_dev, n_real)
        if pending is None:
            raise IOError(f"no frames decoded from {inp}")
        prev, k = pending
        sink.write(np.asarray(prev)[:k])
    finally:
        windows.close()  # join the decode thread BEFORE releasing the reader
        sink.close()
        if reader is not None:
            reader.close()
    dt = time.time() - t0
    return (sink.frames_written,) + tuple(sink.frame_shape), dt


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="video -> video SR")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--cfg-dir", help="trained run directory")
    src.add_argument(
        "--artifact",
        help="AOT-exported .jaxexp artifact (evaluation/export.py) — "
        "serves without the model code or checkpoint; window size and "
        "frame dimensions are fixed at export time",
    )
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
    ap.add_argument(
        "--raw-weights", action="store_true",
        help="serve the raw (non-EMA) weights even when the run kept an "
        "EMA shadow — for comparisons against pre-EMA outputs",
    )
    args = ap.parse_args(argv)

    shape, dt = upscale(
        args.cfg_dir, args.input, args.output, args.window_size,
        args.tile, args.tile_overlap, args.fps, args.codec,
        args.align_chunks, args.stream, use_ema=not args.raw_weights,
        artifact=args.artifact or "",
    )
    print(f"wrote {args.output}: {shape} in {dt:.1f}s "
          f"({shape[0] / max(dt, 1e-9):.2f} frames/s)")


if __name__ == "__main__":
    main()
