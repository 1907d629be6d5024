"""Capture a profiler trace of a full-VRT forward (tile or single-pass).

Default: one 16x128x128 tile of the tiled path (evaluation/tiled.py).
With ``--size 256 --align-chunks 30`` it traces the single-pass
full-scale program instead (chunked parallel-warping alignment — the
production path since perf pass V, docs/tpu_kernel_notes.md), so the
per-op cost attribution can be re-done as the program evolves.

Run: python scripts/trace_vrt_tile.py [--trace] [--size S] [--align-chunks N]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from vsrlab_tpu.models import VRT  # noqa: E402
from vsrlab_tpu.utils import enable_compilation_cache  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument(
        "--align-chunks", type=int, default=0,
        help="chunked parallel-warping alignment (use 30 with --size 256 "
        "to trace the single-pass full-scale program, perf pass V)",
    )
    args = ap.parse_args()

    enable_compilation_cache()
    t, s = args.frames, args.size
    model = VRT(
        upscale=4, img_size=(t, 256, 256), align_chunks=args.align_chunks,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    lr_full = jnp.asarray(rng.random((1, t, 256, 256, 3)), jnp.float32)

    print("init ...", flush=True)
    t0 = time.perf_counter()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), lr_full)
    print(f"init {time.perf_counter()-t0:.0f}s", flush=True)

    def fwd(x):
        sr, _ = model.apply(variables, x)
        return sr

    jit_apply = jax.jit(fwd)
    patch = lr_full[:, :, :s, :s]

    t0 = time.perf_counter()
    sr = jit_apply(patch)
    float(jnp.sum(sr))
    print(f"tile compile+run {time.perf_counter()-t0:.1f}s", flush=True)

    for i in range(3):
        t0 = time.perf_counter()
        sr = jit_apply(patch)
        float(jnp.sum(sr))
        print(f"tile run {time.perf_counter()-t0:.2f}s", flush=True)

    if args.trace:
        jax.profiler.start_trace("/tmp/vrt_tile_trace", create_perfetto_trace=True)
        sr = jit_apply(patch)
        float(jnp.sum(sr))
        jax.profiler.stop_trace()
        print("trace written to /tmp/vrt_tile_trace", flush=True)


if __name__ == "__main__":
    main()
