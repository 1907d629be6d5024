"""Serving-batch sweep: RealBasicVSR 720p-out throughput vs clips/forward.

VERDICT r3 #6 hypothesised ~2x serving capacity at batch 4 from the
conv-chain probe (2.37 -> 1.06 ms/frame) — but that probe ran at the
64x64 TRAIN crop shape, where the conv GEMM M-dimension is small. At the
720p serving shape M = 10*180*320 = 576K already saturates the MXU rows,
so batching should scale ~linearly at best. This sweep measures it.

Run: python scripts/bench_serving_batch.py  (real TPU)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from vsrlab_tpu.evaluation.params_bench import speed_bench  # noqa: E402
from vsrlab_tpu.models import RealBasicVSR  # noqa: E402
from vsrlab_tpu.utils import enable_compilation_cache  # noqa: E402


def main():
    enable_compilation_cache()
    model = RealBasicVSR(
        mid_channels=64, res_blocks=30, cleaning_blocks=20, dtype=jnp.bfloat16
    )
    lr0 = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), lr0)["params"]

    for b in (1, 2, 4):
        stats = speed_bench(model, params, clip_shape=(b, 10, 180, 320, 3))
        total_fps = b * stats["frames_per_sec"]
        print(
            f"batch {b}: {stats['avg_time']*1e3:8.1f} ms/fwd  "
            f"{total_fps:6.2f} fps total  "
            f"{total_fps / b:6.2f} fps/clip",
            flush=True,
        )


if __name__ == "__main__":
    main()
