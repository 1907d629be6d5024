"""One-command weights-level parity acceptance (BASELINE.md north star).

The ≤0.05 dB acceptance bar needs two assets that are NOT on this box
(no egress): a published reference torch checkpoint and an evaluation
dataset (REDS4 / Vimeo layout). The moment they appear, this single
command closes the bar:

    python scripts/acceptance.py --model vrt \
        --checkpoint /assets/002_VRT_videosr_bi_REDS_16frames.pth \
        --data /assets/REDS4 --published-psnr 32.19 --published-ssim 0.9006

    python scripts/acceptance.py --model realbasicvsr \
        --checkpoint /assets/RealBasicVSR_x4.pth \
        --data /assets/REDS4 --published-psnr <reference-run value>

Dataset layout: ``<data>/<clip>/hr/*.png`` (ground truth) with optional
``<data>/<clip>/lr/*.png`` (pre-generated LR; bicubic ÷scale is derived
from HR when absent, the same protocol as DatasetVSR /
reference src/vsr/dataset.py:44-57). A flat ``<data>/<clip>/*.png``
tree is treated as HR-only.

Checkpoint: a raw ``state_dict`` or a dict containing one under
``model_state_dict`` / ``state_dict`` / ``params`` (the reference's
checkpoint.tar layout, src/core/utils.py:69-90). Converted with the
oracle-tested importers in ``vsrlab_tpu.core.torch_import``.

Prints one JSON line and exits 0 on pass, 1 on fail, 2 when blocked on
a missing asset. torch is used only to deserialize the checkpoint
(scripts/tests may; product code may not — CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

# paper-published anchors (BASELINE.md); RealBasicVSR publishes no PSNR
# (real-world SR, NIQE-evaluated) so its target must come from a
# reference-framework run via --published-psnr
PUBLISHED = {
    "vrt": {"psnr": 32.19, "ssim": 0.9006},      # REDS4 4x, 16-frame
}


def build_model(name: str, args):
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if name == "realbasicvsr":
        from vsrlab_tpu.models import RealBasicVSR

        return RealBasicVSR(
            mid_channels=args.mid_channels,
            res_blocks=args.res_blocks,
            cleaning_blocks=args.cleaning_blocks,
            dtype=dtype,
        )
    if name == "vrt":
        from vsrlab_tpu.models import VRT

        return VRT(
            upscale=4,
            img_size=(args.window, args.tile or 256, args.tile or 256),
            align_chunks=args.align_chunks,
            dtype=dtype,
        )
    if name == "tinyvrt":
        from vsrlab_tpu.models import TinyVRT

        return TinyVRT(upscale=4, align_chunks=args.align_chunks, dtype=dtype)
    raise SystemExit(f"unknown --model {name!r}")


def stream_windows(stream_fwd, params, lr, window: int):
    """Stateful windowed inference (BasicVSR family): the forward
    recurrence state carries across windows, so the result keeps temporal
    continuity a chunked run discards (the serving configuration
    ``upscale --stream`` uses)."""
    import jax.numpy as jnp

    first, rest = stream_fwd
    state, srs = None, []
    for i in range(0, lr.shape[1], window):
        win = jnp.asarray(lr[:, i:i + window])
        sr_win, state = (first(params, win) if state is None
                         else rest(params, win, state))
        srs.append(sr_win)
    return jnp.concatenate(srs, axis=1)


def selftest() -> int:
    """Exercise every serving configuration the real acceptance would use
    — RealBasicVSR × (windowed, streamed) and TinyVRT windowed with
    chunked alignment — on synthetic assets with tiny random-init models,
    so the day real checkpoints appear none of these paths runs for the
    first time (reference serving surface: src/test.py:124-135)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vsrlab_tpu.core.metrics import psnr
    from vsrlab_tpu.evaluation.harness import (
        make_forward,
        make_stream_forward,
        windowed_inference,
    )
    from vsrlab_tpu.models import RealBasicVSR, TinyVRT
    from vsrlab_tpu.ops.resize import resize_bicubic

    rng = np.random.default_rng(0)
    t, h, w, s = 4, 16, 16, 4
    hr = rng.random((1, t, h * s, w * s, 3)).astype(np.float32)
    lr = np.asarray(
        resize_bicubic(jnp.asarray(hr[0]), (h, w))
    )[None]
    hr_j = jnp.asarray(hr)
    results = {}

    rb = RealBasicVSR(mid_channels=8, res_blocks=2, cleaning_blocks=1)
    p = jax.jit(rb.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, h, w, 3), jnp.float32)
    )["params"]
    sr, _ = windowed_inference(make_forward(rb), p, lr, 2)
    results["realbasicvsr_windowed_psnr"] = float(
        psnr(jnp.clip(sr[:, :t], 0, 1), hr_j))
    sr2 = stream_windows(make_stream_forward(rb), p, lr, 2)
    results["realbasicvsr_streamed_psnr"] = float(
        psnr(jnp.clip(sr2, 0, 1), hr_j))

    vrt = TinyVRT(
        upscale=4, window_size=(2, 4, 4), depths=(1,) * 7,
        embed_dims=(8,) * 7, num_heads=(2,) * 7, deformable_groups=2,
        drop_path_rate=0.0, align_chunks=1,
    )
    pv = jax.jit(vrt.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 2, h, w, 3), jnp.float32)
    )["params"]
    srv, _ = windowed_inference(make_forward(vrt), pv, lr, 2)
    results["tinyvrt_chunked_align_windowed_psnr"] = float(
        psnr(jnp.clip(srv[:, :t], 0, 1), hr_j))

    ok = all(np.isfinite(v) for v in results.values())
    print(json.dumps({"selftest": bool(ok),
                      **{k: round(v, 3) for k, v in results.items()}}))
    return 0 if ok else 1


def import_params(name: str, checkpoint: Path):
    import torch

    from vsrlab_tpu.core import torch_import

    ckpt = torch.load(checkpoint, map_location="cpu", weights_only=False)
    sd = ckpt
    for key in ("model_state_dict", "state_dict", "params"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
            break
    if name == "realbasicvsr":
        return torch_import.load_torch_realbasicvsr(sd)
    # both VRT variants: scale-stage count from the model family
    n_scale_stages = 7 if name == "vrt" else 5
    return torch_import.load_torch_vrt(sd, n_scale_stages=n_scale_stages)


def clip_dirs(data: Path):
    """Yield (name, hr_dir, lr_dir | None) for every clip under data."""
    for d in sorted(p for p in data.iterdir() if p.is_dir()):
        if (d / "hr").is_dir():
            yield d.name, d / "hr", (d / "lr") if (d / "lr").is_dir() else None
        elif any(p.is_file() for p in d.iterdir()):
            yield d.name, d, None


def main(argv=None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if "--selftest" in argv:
        return selftest()
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", required=True,
                    choices=("realbasicvsr", "vrt", "tinyvrt"))
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--window", type=int, default=16,
                    help="frames per inference window")
    ap.add_argument("--bar", type=float, default=0.05,
                    help="acceptance bar in dB (north star: 0.05)")
    ap.add_argument("--published-psnr", type=float, default=None)
    ap.add_argument("--published-ssim", type=float, default=None)
    ap.add_argument("--y", action="store_true",
                    help="Y-channel (BT.601) metrics — the Vimeo/Vid4 protocol")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 compute (the serving dtype). Default is "
                         "fp32: a 0.05 dB gate must not spend its budget "
                         "on compute-dtype rounding — measure the "
                         "serving dtype separately once fp32 parity "
                         "holds")
    ap.add_argument("--tile", type=int, default=0,
                    help="spatial tiling for inputs whose single-pass "
                         "program exceeds HBM (evaluation/tiled.py)")
    ap.add_argument("--stream", action="store_true",
                    help="stateful windowed inference (BasicVSR family): "
                         "the forward recurrence state carries across "
                         "windows, matching a full-clip pass")
    ap.add_argument("--align-chunks", type=int, default=30,
                    help="VRT chunked alignment (single-pass HBM fit)")
    ap.add_argument("--mid-channels", type=int, default=64)
    ap.add_argument("--res-blocks", type=int, default=30)
    ap.add_argument("--cleaning-blocks", type=int, default=20)
    ap.add_argument("--max-clips", type=int, default=0)
    args = ap.parse_args(argv)

    checkpoint, data = Path(args.checkpoint), Path(args.data)
    if not checkpoint.exists():
        print(json.dumps({"blocked": f"checkpoint not found: {checkpoint}"}))
        return 2
    clips = list(clip_dirs(data)) if data.is_dir() else []
    if not clips:
        print(json.dumps({"blocked": f"no clip folders under: {data}"}))
        return 2
    if args.max_clips:
        clips = clips[: args.max_clips]

    import jax.numpy as jnp
    import numpy as np

    from vsrlab_tpu.core.metrics import psnr, psnr_y, ssim, ssim_y
    from vsrlab_tpu.evaluation.harness import (
        get_video,
        make_forward,
        make_stream_forward,
        windowed_inference,
    )
    from vsrlab_tpu.ops.resize import resize_bicubic

    params = import_params(args.model, checkpoint)
    model = build_model(args.model, args)
    if args.stream and not hasattr(model, "fuse_directions"):
        raise SystemExit("--stream needs a recurrent model "
                         "(BasicVSR family)")
    stream_fwd = make_stream_forward(model) if args.stream else None
    forward = None if args.stream else make_forward(model,
                                                    tile=args.tile or None)
    psnr_fn, ssim_fn = (psnr_y, ssim_y) if args.y else (psnr, ssim)

    per_clip = {}
    for name, hr_dir, lr_dir in clips:
        hr = get_video(hr_dir)
        if lr_dir is not None:
            lr = get_video(lr_dir)
        else:
            # crop HR to the scale-divisible region before deriving LR:
            # otherwise SR comes back (h//s)*s × (w//s)*s and the metric
            # fails on a shape mismatch instead of measuring anything
            b, t, h, w, c = hr.shape
            hs, ws = h // args.scale * args.scale, w // args.scale * args.scale
            if (hs, ws) != (h, w):
                print(f"# {name}: cropping HR {h}x{w} -> {hs}x{ws} "
                      f"(scale-divisible region)", file=sys.stderr)
                hr = hr[:, :, :hs, :ws]
                h, w = hs, ws
            lr = np.asarray(
                resize_bicubic(
                    jnp.asarray(hr.reshape(b * t, h, w, c)),
                    (h // args.scale, w // args.scale),
                )
            ).reshape(b, t, h // args.scale, w // args.scale, c)
        if args.stream:
            sr = stream_windows(stream_fwd, params, lr, args.window)
        else:
            sr, _ = windowed_inference(forward, params, lr, args.window)
        sr = jnp.clip(sr.astype(jnp.float32), 0.0, 1.0)
        hr_j = jnp.asarray(hr[:, : sr.shape[1]])
        per_clip[name] = (
            float(psnr_fn(sr, hr_j)), float(ssim_fn(sr, hr_j))
        )
        print(f"# {name}: PSNR {per_clip[name][0]:.3f} "
              f"SSIM {per_clip[name][1]:.4f}", file=sys.stderr)

    mean_psnr = float(np.mean([v[0] for v in per_clip.values()]))
    mean_ssim = float(np.mean([v[1] for v in per_clip.values()]))
    pub = PUBLISHED.get(args.model, {})
    pub_psnr = (args.published_psnr if args.published_psnr is not None
                else pub.get("psnr"))
    pub_ssim = (args.published_ssim if args.published_ssim is not None
                else pub.get("ssim"))

    out = {
        "model": args.model,
        "clips": len(per_clip),
        "psnr": round(mean_psnr, 4),
        "ssim": round(mean_ssim, 5),
        "metric_channel": "Y" if args.y else "RGB",
        "mode": ("streamed" if args.stream
                 else "tiled" if args.tile else "windowed"),
        "bar_db": args.bar,
    }
    if pub_psnr is None:
        out["pass"] = None
        out["note"] = ("no published PSNR for this model — pass "
                       "--published-psnr from a reference-framework run")
        print(json.dumps(out))
        return 2
    out["published_psnr"] = pub_psnr
    out["delta_db"] = round(mean_psnr - pub_psnr, 4)
    if pub_ssim is not None:
        out["published_ssim"] = pub_ssim
        out["delta_ssim"] = round(mean_ssim - pub_ssim, 5)
    out["pass"] = abs(out["delta_db"]) <= args.bar
    print(json.dumps(out))
    return 0 if out["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
