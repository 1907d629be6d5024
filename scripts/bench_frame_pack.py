"""Microbench: two-frame CHANNEL PACKING (C=64 -> 128 lanes) through the
cleaner/trunk conv chain (VERDICT r4 #2 — the one MXU-occupancy lever
not yet in docs/tpu_kernel_notes.md).

The cleaner runs its 3x20-block chain over frames as BATCH (b*t = 10 at
the bench shape). Output channels map to MXU lanes, so C=64 occupies 64
of 128 lanes regardless of batch. Packing two frames channel-wise keeps
semantics exact only as a block-diagonal C=128 conv with the SAME weight
block twice (cleaner weights are shared across frames) — 2x the nominal
FLOPs (the cross blocks are zeros) for a full-lane GEMM. Useful-FLOPs
win iff the C=128 rate is > 2x the batch-10 C=64 rate.

Prior art (bench_blockdiag.py, batch-1 recurrence shapes): dense C=128
raw rate 65.7 TF/s ~= 2x the lone C=64 chain (17.9) but only ~1.06x the
flat-interleaved two-chain stream (31.2) -> useful ~33. This script
measures the BATCHED cleaner variant, where the baseline already
pipelines across 10 batch rows.

Run: python scripts/bench_frame_pack.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, C, CONVS, BT = 180, 320, 64, 20, 10


def timed(fn, args, iters=10):
    o = fn(*args)
    float(jnp.sum(o))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(*args)
        float(jnp.sum(o))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def conv(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    x10 = jnp.asarray(rng.standard_normal((BT, H, W, C)) * 0.1, jnp.bfloat16)
    ws = [jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
          for _ in range(CONVS)]

    useful_flops = 2 * BT * H * W * (9 * C) * C * CONVS

    # A: today's cleaner structure — one C=64 chain over batch 10
    def batch10(x, *ws):
        for w in ws:
            x = jnp.maximum(conv(x, w), 0)
        return jnp.sum(x)

    dt = timed(jax.jit(batch10), (x10, *ws))
    print(f"batch10 C=64       : {dt*1e3:8.3f} ms  useful "
          f"{useful_flops/dt/1e12:6.1f} TFLOP/s")

    # B: two frames packed channel-wise — batch 5, block-diagonal C=128
    # with the SAME weight block twice (exact cleaner semantics)
    x5 = jnp.concatenate([x10[0::2], x10[1::2]], axis=-1)

    def packed(x, *ws):
        for w in ws:
            wz = jnp.zeros((3, 3, 2 * C, 2 * C), x.dtype)
            wz = wz.at[:, :, :C, :C].set(w).at[:, :, C:, C:].set(w)
            x = jnp.maximum(conv(x, wz), 0)
        return jnp.sum(x)

    dt = timed(jax.jit(packed), (x5, *ws))
    print(f"packed  C=128 (bd) : {dt*1e3:8.3f} ms  useful "
          f"{useful_flops/dt/1e12:6.1f} TFLOP/s")

    # C: raw-rate reference — dense C=128 chain at batch 5 (counts all
    # FLOPs; the ceiling the packing would have to reach 2x of A to win)
    w128 = [jnp.asarray(rng.standard_normal((3, 3, 2 * C, 2 * C)) * 0.05,
                        jnp.bfloat16) for _ in range(CONVS)]

    def dense(x, *ws):
        for w in ws:
            x = jnp.maximum(conv(x, w), 0)
        return jnp.sum(x)

    dt = timed(jax.jit(dense), (x5, *w128))
    raw = 2 * (BT // 2) * H * W * (9 * 2 * C) * (2 * C) * CONVS
    print(f"dense   C=128      : {dt*1e3:8.3f} ms  raw    "
          f"{raw/dt/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    sys.exit(main())
