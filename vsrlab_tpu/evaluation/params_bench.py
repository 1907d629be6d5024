"""Per-model parameter count + inference-speed bench.

Capability parity with the reference ``src/params.py``: measures average
per-clip inference wall time over windowed inputs and counts parameters;
writes one CSV row per model directory.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def param_count(params) -> int:
    """Total trainable parameters (reference get_params, src/params.py:23-24)."""
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def speed_bench(
    model,
    params,
    clip_shape=(1, 10, 180, 320, 3),
    n_iters: int = 5,
) -> Dict[str, float]:
    """Average jitted forward time for one clip (post-compile, host-synced)."""
    lr = jnp.asarray(np.random.default_rng(0).random(clip_shape), jnp.float32)

    @jax.jit
    def forward(p, x):
        out = model.apply({"params": p}, x)
        sr = out[0] if isinstance(out, tuple) else out
        return jnp.sum(sr)

    float(forward(params, lr))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            s = forward(params, lr)
        float(s)
        best = min(best, (time.perf_counter() - t0) / n_iters)
    return {
        "avg_time": best,
        "frames_per_sec": clip_shape[1] / best,
        "params": param_count(params),
    }


def run(
    cfg_dirs: List[str],
    out_csv: Optional[str] = None,
    batch: int = 1,
    window_size: int = 10,
    height: int = 180,
    width: int = 320,
):
    """Bench every model directory (reference run, src/params.py:67-133).

    ``batch > 1`` measures multi-clip serving throughput: one jitted
    forward over ``batch`` independent clips — the deployment shape for
    a saturated serving chip (the reference bench is single-clip only,
    src/params.py:115-127). ``frames_per_sec`` counts all clips.
    """
    import pandas as pd

    from vsrlab_tpu.evaluation.harness import load_test_model

    rows = []
    for cfg_dir in cfg_dirs:
        model, params, _ = load_test_model(cfg_dir)
        stats = speed_bench(
            model, params, clip_shape=(batch, window_size, height, width, 3)
        )
        stats["frames_per_sec"] *= batch
        rows.append({"model": Path(cfg_dir).name, "batch": batch, **stats})
        print(rows[-1])
    df = pd.DataFrame(rows)
    if out_csv:
        df.to_csv(out_csv, index=False)
    return df


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("cfg_dirs", nargs="+")
    ap.add_argument("--out", default=None)
    ap.add_argument("--batch", type=int, default=1,
                    help="clips per forward (serving throughput)")
    ap.add_argument("--window-size", type=int, default=10)
    ap.add_argument("--height", type=int, default=180)
    ap.add_argument("--width", type=int, default=320)
    args = ap.parse_args(argv)
    print(run(args.cfg_dirs, args.out, args.batch, args.window_size,
              args.height, args.width))


if __name__ == "__main__":
    main()
