"""Teacher-flow distillation dataset builder.

Capability parity with the reference
(src/optical_flow/create_dataset.py:11-36), which runs a frozen ptlflow
GMFlow teacher over all adjacent frame pairs and saves per-pair flows.
ptlflow isn't available here; the teacher is our pretrained RAFT-small
(the reference ships its weights, src/optical_flow/weights/raft-small.pth).

Usage::

    python -m vsrlab_tpu.data.create_flow_dataset \
        --frames <root-of-video-folders> --out <flow-dir> \
        [--height 384 --width 512]

Writes ``<out>/<video>_<f1>_<f2>.npz`` with key ``flow`` (H, W, 2).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def build_teacher(raft_ckpt: str | None = None):
    import jax
    import torch

    from vsrlab_tpu.models.flow import RAFT, load_torch_raft

    ckpt = raft_ckpt or "/root/reference/src/optical_flow/weights/raft-small.pth"
    model = RAFT(small=True, scale_factor=8)
    params = load_torch_raft(torch.load(ckpt, map_location="cpu"), small=True)
    fwd = jax.jit(lambda a, b: model.apply({"params": params}, a, b))
    return fwd


def main(argv=None):
    import jax.numpy as jnp

    from vsrlab_tpu.data.datasets import load_frame

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--raft-ckpt", default=None)
    args = ap.parse_args(argv)

    import cv2

    fwd = build_teacher(args.raft_ckpt)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    for video in sorted(Path(args.frames).iterdir()):
        if not video.is_dir():
            continue
        frames = sorted(p for p in video.iterdir() if p.is_file())
        for p1, p2 in zip(frames[:-1], frames[1:]):
            a = cv2.resize(load_frame(p1), (args.width, args.height))
            b = cv2.resize(load_frame(p2), (args.width, args.height))
            flow = fwd(jnp.asarray(a[None]), jnp.asarray(b[None]))
            name = f"{video.name}_{p1.stem}_{p2.name}"
            np.savez_compressed(out / f"{name}.npz", flow=np.asarray(flow[0]))
            print(name)


if __name__ == "__main__":
    main()
