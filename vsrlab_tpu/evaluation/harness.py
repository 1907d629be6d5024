"""Inference / evaluation harness.

Capability parity with the reference ``src/test.py:65-157``:

* loads a trained model from a checkpoint directory (orbax checkpoint +
  ``config.yaml`` snapshot — reference build_test_model,
  src/core/utils.py:156-165, src/test.py:80-82);
* sweeps a compressed-video test matrix fps ∈ {6,8,10} × crf ∈ {30,32,34};
* chunks long videos into ``window_size`` windows (reference :124-135) —
  here the window chunks are STACKED into one batch and sharded over the
  mesh ``time`` axis, so long-clip inference scales across chips
  (sequence-parallel capability the reference lacks, SURVEY.md §2.8);
* computes PSNR/SSIM per window plus compression factor and
  bits-per-pixel from file sizes (reference :116-121);
* dumps SR frames as PNGs and writes a per-configuration CSV.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vsrlab_tpu.core.checkpoint import CheckpointManager, load_config_snapshot
from vsrlab_tpu.core.config import Config, instantiate
from vsrlab_tpu.core.metrics import MetricCollection
from vsrlab_tpu.data.datasets import load_frame


def load_test_model(cfg_dir: str, use_ema: bool = True):
    """Rebuild the model from a run directory's config snapshot and load
    the latest checkpoint. Returns (model, params, config).

    Runs trained with ``train.ema_decay`` keep an EMA shadow under
    ``<run>/ema``; by default that (better-generalising) average is what
    serves — pass ``use_ema=False`` for the raw weights."""
    import vsrlab_tpu.components  # noqa: F401
    from vsrlab_tpu.train.builders import build_model

    cfg = Config.from_dict(load_config_snapshot(cfg_dir))
    model = build_model(cfg.train.model, cfg.train.get("precision", "fp32"))
    mgr = CheckpointManager(cfg_dir)
    key = mgr.latest_epoch()
    params = None
    ema_dir = Path(cfg_dir) / "ema"
    if use_ema and ema_dir.is_dir():
        # serve the shadow ONLY when it is aligned with the latest main
        # checkpoint — an ema dir left behind by an earlier EMA-enabled
        # phase (or a save interrupted between the paired writes) must
        # not silently serve stale weights
        ema_mgr = CheckpointManager(str(ema_dir))
        if ema_mgr.latest_epoch() == key:
            _, payload = ema_mgr.restore()
            params = payload["params"]
            print(f"serving EMA weights from {ema_dir} @ key {key}")
        else:
            print(
                f"WARNING: {ema_dir} latest key {ema_mgr.latest_epoch()} != "
                f"main checkpoint key {key} — serving RAW weights (stale or "
                "partial EMA sidecar)"
            )
        ema_mgr.close()
    if params is None:
        _, payload = mgr.restore()
        params = payload["params"]
    mgr.close()
    # template-less orbax restores yield NUMPY leaves; upload once here
    # (one batched transfer) or every jitted call re-sends the full
    # weight set host->device per window/video — for full VRT that is
    # ~123 MB through the tunnel per 10-frame window
    return model, jax.device_put(params), cfg


def get_video(path, pool=None) -> np.ndarray:
    """Frame folder -> (1, T, H, W, 3) float32 (reference get_video,
    src/core/utils.py:282-288); decoding is threaded."""
    from concurrent.futures import ThreadPoolExecutor

    frames = sorted(p for p in Path(path).iterdir() if p.is_file())
    if pool is None:
        with ThreadPoolExecutor(8) as pool_:
            imgs = list(pool_.map(load_frame, frames))
    else:
        imgs = list(pool.map(load_frame, frames))
    return np.stack(imgs)[None]


def _tpu_compile_opts():
    """Measured-fastest TPU compile options (docs/tpu_kernel_notes.md
    compiler-option sweep) — ONE definition so batch and streaming
    inference always compile with the same options."""
    if jax.default_backend() != "tpu":
        return None
    return {
        "xla_tpu_enable_experimental_fusion_cost_model": "true",
        "xla_tpu_scoped_vmem_limit_kib": "32768",
    }


def make_forward(model, tile: Optional[int] = None, tile_overlap: int = 16):
    """Build the sr-only inference callable ``forward(params, clip)``.

    jits ONCE with params as an argument (a fresh jit wrapper per call
    would re-trace the model per video); ``tile`` wraps it in the
    official-VRT spatial tiling (evaluation/tiled.py) for models whose
    single-pass footprint exceeds HBM. Applies the measured-fastest
    TPU compile options (docs/tpu_kernel_notes.md compiler-option sweep).
    """
    opts = _tpu_compile_opts()

    def _sr_only(p, x):
        out = model.apply({"params": p}, x)
        return out[0] if isinstance(out, tuple) else out

    raw = jax.jit(_sr_only, compiler_options=opts)
    if not tile:
        return raw

    from vsrlab_tpu.evaluation.tiled import tiled_forward

    def forward(p, x):
        return tiled_forward(
            lambda z: raw(p, z), x, (tile, tile), tile_overlap, jit=False
        )

    return forward


def make_stream_forward(model):
    """Build ``(first, rest)`` jitted callables for stateful windowed
    inference (BasicVSR family only — see ``BasicVSR.__call__``):
    ``first(params, window) -> (sr, state)`` and
    ``rest(params, window, state) -> (sr, state)``. Carrying the state
    across sequential windows makes the forward-direction recurrence
    bitwise identical to a full-clip run, so long videos keep temporal
    continuity the reference's window chunking discards
    (src/test.py:124-135)."""
    opts = _tpu_compile_opts()

    def _first(p, x):
        out = model.apply({"params": p}, x, return_state=True)
        return out[0], out[-1]

    def _rest(p, x, state):
        out = model.apply(
            {"params": p}, x, stream_state=state, return_state=True
        )
        return out[0], out[-1]

    return (
        jax.jit(_first, compiler_options=opts),
        jax.jit(_rest, compiler_options=opts),
    )


def windowed_inference(
    forward: Callable,
    params,
    video_lr: np.ndarray,
    window_size: int,
    mesh=None,
) -> Tuple[jnp.ndarray, int]:
    """Chunked long-video inference: split (1, T, H, W, C) into
    ``window_size`` windows, run them as ONE batch (sharded over the mesh
    ``time`` axis when given), and restitch. Returns (sr, num_windows).
    """
    _, t, h, w, c = video_lr.shape
    n_windows = -(-t // window_size)
    pad = n_windows * window_size - t
    v = np.concatenate(
        [video_lr, np.repeat(video_lr[:, -1:], pad, axis=1)], axis=1
    ) if pad else video_lr
    stacked = v.reshape(n_windows, window_size, h, w, c)

    x = jnp.asarray(stacked)
    if mesh is not None and "time" in mesh.shape:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # pad window-batch to a multiple of the time-axis size
        nt = mesh.shape["time"]
        bpad = (-n_windows) % nt
        if bpad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], bpad, axis=0)], axis=0)
        x = jax.device_put(x, NamedSharding(mesh, P("time")))

    sr = forward(params, x)
    if isinstance(sr, tuple):
        sr = sr[0]
    sr = sr[:n_windows]
    scale = sr.shape[2] // h
    sr = sr.reshape(1, n_windows * window_size, h * scale, w * scale, -1)
    return sr[:, :t], n_windows


def run_test_matrix(
    cfg_dir: str,
    lr_dir: str,
    hr_dir: str,
    out_dir: str,
    window_size: int = 10,
    fps_list=(6, 8, 10),
    crf_list=(30, 32, 34),
    hr_crf: int = 5,
    metrics=None,
    save_frames: bool = True,
    mesh=None,
    tile: Optional[int] = None,
    tile_overlap: int = 16,
    align_chunks: int = 0,
    use_ema: bool = True,
) -> "pandas.DataFrame":
    """Full fps×crf evaluation sweep (reference src/test.py:94-155).

    ``tile`` switches each window's forward to overlapping spatial tiles
    with mean-blended stitching (the official-VRT ``--tile`` protocol,
    evaluation/tiled.py) — required when the model's single-pass
    activation footprint exceeds HBM. ``align_chunks`` (VRT family)
    chunks the parallel-warping alignment instead, which fits much
    larger windows single-pass at identical numerics and is faster than
    tiling when it fits (docs/tpu_kernel_notes.md perf pass V).

    Directory layout (reference convention): ``<lr_dir>/fps=F_crf=C/frames/<video>/``
    frame folders plus ``.../video/<video>`` encoded files for bitrate stats;
    HR under ``<hr_dir>/fps=F_crf=5/...``.
    """
    import pandas as pd

    try:
        import cv2
    except ImportError:
        cv2 = None

    model, params, _cfg = load_test_model(cfg_dir, use_ema=use_ema)
    if align_chunks and hasattr(model, "align_chunks"):
        model = model.clone(align_chunks=align_chunks)
    forward = make_forward(model, tile, tile_overlap)

    # metric set: explicit arg > run-config snapshot > PSNR/SSIM default
    # (reference builds its metric from config too, src/core/utils.py:178-181;
    # PSNR_Y/SSIM_Y enable the Vimeo/Vid4 luma protocol). Validated
    # up-front — a typo must fail before videos start decoding.
    from vsrlab_tpu.core.metrics import resolve_metric_names
    from vsrlab_tpu.train.step import metrics_from_config

    metrics = (
        metrics_from_config(_cfg.train) if metrics is None
        else resolve_metric_names(metrics)
    )
    metric_fns = dict(MetricCollection.BUILTIN)
    rows: List[Dict] = []
    name = Path(cfg_dir).name
    output_folder = Path(out_dir) / name

    for fps in fps_list:
        for crf in crf_list:
            video_folder = Path(lr_dir) / f"fps={fps}_crf={crf}" / "frames"
            video_paths = sorted(p for p in video_folder.glob("*") if p.is_dir())
            sums = {k: 0.0 for k in metrics}
            bpp = cf = 0.0
            n_bitrate = 0  # videos with encoded files present
            for video_lr_path in video_paths:
                t0 = time.time()
                vname = video_lr_path.name
                video_hr_path = Path(hr_dir) / f"fps={fps}_crf={hr_crf}" / "frames" / vname
                video_lr = get_video(video_lr_path)
                video_hr = get_video(video_hr_path)
                _, f, hh, ww, cc = video_hr.shape

                orig_file = Path(hr_dir) / f"fps={fps}_crf={hr_crf}" / "video" / vname
                comp_file = Path(lr_dir) / f"fps={fps}_crf={crf}" / "video" / vname
                if orig_file.exists() and comp_file.exists():
                    bits_orig = orig_file.stat().st_size * 8
                    bits_comp = comp_file.stat().st_size * 8
                    cf += bits_comp / bits_orig
                    bpp += bits_comp / (cc * hh * ww * f)
                    n_bitrate += 1

                sr, n_windows = windowed_inference(
                    forward, params, video_lr, window_size, mesh
                )
                vmetrics = {
                    k: float(metric_fns[k](jnp.clip(sr, 0, 1), jnp.asarray(video_hr)))
                    for k in metrics
                }
                for k in metrics:
                    sums[k] += vmetrics[k]

                if save_frames and cv2 is not None:
                    save_folder = output_folder / f"fps={fps}_crf={crf}" / vname
                    save_folder.mkdir(parents=True, exist_ok=True)
                    frames = np.asarray(jnp.clip(sr[0], 0, 1))
                    for i, frame in enumerate(frames):
                        u8 = (frame * 255).round().astype(np.uint8)
                        cv2.imwrite(
                            str(save_folder / f"img{i:05d}.png"), u8[..., ::-1]
                        )
                print(
                    f"fps={fps} crf={crf} {vname}: "
                    + " ".join(f"{k}={v:.3f}" for k, v in vmetrics.items())
                    + f" ({time.time() - t0:.1f}s)"
                )

            n = max(len(video_paths), 1)
            # cf/bpp average over the videos actually measured (encoded
            # files present), not all videos — averaging over n would
            # silently bias the stats low when files are missing
            nb = max(n_bitrate, 1)
            rows.append(
                {
                    "cf": cf / nb,
                    "bpp": bpp / nb,
                    "fps": fps,
                    "crf": crf,
                    **{k: v / n for k, v in sums.items()},
                }
            )

    results = pd.DataFrame(rows)
    output_folder.mkdir(parents=True, exist_ok=True)
    results.to_csv(output_folder / f"{name}.csv", index=False)
    return results


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="fps×crf evaluation sweep")
    ap.add_argument("--cfg-dir", required=True)
    ap.add_argument("--lr-dir", required=True)
    ap.add_argument("--hr-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--window-size", type=int, default=10)
    ap.add_argument(
        "--tile", type=int, default=0,
        help="spatial tile size for tiled inference (official-VRT --tile "
        "protocol; 0 = single-pass)",
    )
    ap.add_argument("--tile-overlap", type=int, default=16)
    ap.add_argument(
        "--align-chunks", type=int, default=0,
        help="VRT memory knob: chunked parallel-warping alignment — "
        "fits large windows single-pass at identical numerics",
    )
    ap.add_argument(
        "--raw-weights", action="store_true",
        help="serve the raw (non-EMA) weights even when the run kept an "
        "EMA shadow — for comparisons against pre-EMA metrics",
    )
    args = ap.parse_args(argv)
    df = run_test_matrix(
        args.cfg_dir, args.lr_dir, args.hr_dir, args.out_dir,
        args.window_size, tile=args.tile or None,
        tile_overlap=args.tile_overlap, align_chunks=args.align_chunks,
        use_ema=not args.raw_weights,
    )
    print(df)


if __name__ == "__main__":
    main()
