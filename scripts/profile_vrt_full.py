"""Full-scale (paper-config) VRT on the chip (VERDICT r2 #3, driver
benchmark config #5: 16-frame 256×256 clips, ~35 M params,
deformable_groups=12).

Measures param count, forward latency/fps at (1,16,256,256,3), and —
optionally — one supervised train step with remat (memory at this scale
is the open question the tiny-shape tests can't answer).

Run: python scripts/profile_vrt_full.py [--frames N] [--size S] [--train]
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


def timed(fn, *args, iters=3):
    from vsrlab_tpu.utils import best_time

    def call_and_sync(n):
        out = None
        for _ in range(n):
            out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))

    return best_time(call_and_sync, iters, repeats=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--train", action="store_true")
    ap.add_argument(
        "--remat", action="store_true",
        help="remat each Stage/RTMSA block (required for full-config "
        "training: un-remat'd step needs 21.8 G vs 15.75 G HBM)",
    )
    ap.add_argument(
        "--tile", type=int, default=0,
        help="spatial tile size for tiled inference (official-VRT --tile "
        "protocol; 0 = single-pass)",
    )
    ap.add_argument("--overlap", type=int, default=16)
    ap.add_argument(
        "--align-chunks", type=int, default=0,
        help="chunk each Stage's parallel-warping alignment over the "
        "frame-pair batch (memory knob for single-pass large shapes)",
    )
    args = ap.parse_args()

    enable_compilation_cache()
    t, s = args.frames, args.size
    model = VRT(
        upscale=4, img_size=(t, s, s), remat=args.remat,
        align_chunks=args.align_chunks, dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((1, t, s, s, 3)), jnp.float32)

    print(f"initialising full VRT at ({t},{s},{s}) ...", flush=True)
    t0 = time.perf_counter()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), lr)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    print(
        f"params: {n_params/1e6:.2f} M (init {time.perf_counter()-t0:.0f}s)",
        flush=True,
    )

    if args.tile:
        from vsrlab_tpu.evaluation import tiled_forward

        # jit ONCE with params as an argument (tiled_forward(jit=True)
        # would re-wrap per call and re-trace the 30M-param model inside
        # every timed iteration; bench.py does the same)
        raw = jax.jit(lambda v, z: model.apply(v, z)[0])

        def run_tiled(x):
            return tiled_forward(
                lambda z: raw(variables, z), x,
                (args.tile, args.tile), args.overlap, scale=4, jit=False,
            )

        t0 = time.perf_counter()
        sr = run_tiled(lr)
        float(jnp.sum(sr))
        print(
            f"tiled({args.tile},ov{args.overlap}) compile+run: "
            f"{time.perf_counter()-t0:.0f}s, out {sr.shape}",
            flush=True,
        )
        dt = timed(run_tiled, lr, iters=2)
        print(
            f"tiled forward: {dt*1e3:.1f} ms  ({t/dt:.2f} frames/s)",
            flush=True,
        )
        return

    @jax.jit
    def forward(v, x):
        sr, _ = model.apply(v, x)
        return sr

    t0 = time.perf_counter()
    sr = forward(variables, lr)
    float(jnp.sum(sr))
    print(
        f"forward compile+run: {time.perf_counter()-t0:.0f}s, out {sr.shape}",
        flush=True,
    )
    dt = timed(forward, variables, lr)
    print(f"forward: {dt*1e3:.1f} ms  ({t/dt:.2f} frames/s)", flush=True)

    if args.train:
        import optax

        from vsrlab_tpu.train import create_train_state, make_supervised_train_step

        hr = jnp.asarray(
            rng.random((1, t, s * 4, s * 4, 3)), jnp.float32
        )
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
        state = create_train_state(model, jax.random.PRNGKey(0), lr, tx)
        step = make_supervised_train_step(model, donate=False)
        print("compiling train step ...", flush=True)
        t0 = time.perf_counter()
        state, metrics = step(state, {"lr": lr, "hr": hr})
        print(
            f"train step compile+run: {time.perf_counter()-t0:.0f}s "
            f"loss={float(metrics['Loss']):.4f}",
            flush=True,
        )
        dt = timed(lambda s_, b: step(s_, b)[1], state, {"lr": lr, "hr": hr})
        print(f"train step: {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
