"""Microbench: block-DIAGONAL dense C=128 conv chain vs 2 separate C=64
chains (the two BasicVSR propagation directions).

Grouped convs (feature_group_count=2) measured 2.5x WORSE than separate
chains (docs/tpu_kernel_notes.md). This tests the DENSE block-diagonal
form: 2x the nominal FLOPs (zero cross-blocks) but full 128-lane MXU
occupancy. Useful-FLOPs win if dense-128 rate > 2x the batch-1 C=64 rate.

Run: python scripts/bench_blockdiag.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, C, CONVS = 180, 320, 64, 20


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
    xb = jnp.asarray(rng.standard_normal((1, H, W, C)) * 0.1, jnp.bfloat16)
    xf = jnp.asarray(rng.standard_normal((1, H, W, C)) * 0.1, jnp.bfloat16)
    wb = [jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16) for _ in range(CONVS)]
    wf = [jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16) for _ in range(CONVS)]

    useful_flops = 2 * 2 * H * W * (9 * C) * C * CONVS  # both directions

    # A: two separate C=64 chains (today's structure)
    def sep(xb, xf, *ws):
        wb_, wf_ = ws[:CONVS], ws[CONVS:]
        for i in range(CONVS):
            xb = jnp.maximum(conv(xb, wb_[i]), 0)
            xf = jnp.maximum(conv(xf, wf_[i]), 0)
        return jnp.sum(xb) + jnp.sum(xf)

    dt = timed(jax.jit(sep), (xb, xf, *wb, *wf))
    print(f"separate 2x C=64 : {dt*1e3:8.3f} ms  useful {useful_flops/dt/1e12:6.1f} TFLOP/s")

    # B: one dense block-diagonal C=128 chain
    def blockdiag(xb, xf, *ws):
        wb_, wf_ = ws[:CONVS], ws[CONVS:]
        x = jnp.concatenate([xb, xf], axis=-1)
        for i in range(CONVS):
            wz = jnp.zeros((3, 3, 2 * C, 2 * C), x.dtype)
            wz = wz.at[:, :, :C, :C].set(wb_[i]).at[:, :, C:, C:].set(wf_[i])
            x = jnp.maximum(conv(x, wz), 0)
        return jnp.sum(x)

    dt = timed(jax.jit(blockdiag), (xb, xf, *wb, *wf))
    print(f"blockdiag C=128  : {dt*1e3:8.3f} ms  useful {useful_flops/dt/1e12:6.1f} TFLOP/s")

    # C: reference point — plain dense C=128 chain (counts ALL flops)
    x128 = jnp.concatenate([xb, xf], axis=-1)
    w128 = [jnp.asarray(rng.standard_normal((3, 3, 2 * C, 2 * C)) * 0.05, jnp.bfloat16) for _ in range(CONVS)]

    def dense128(x, *ws):
        for wv in ws:
            x = jnp.maximum(conv(x, wv), 0)
        return jnp.sum(x)

    dt = timed(jax.jit(dense128), (x128, *w128))
    all_flops = 2 * H * W * (9 * 2 * C) * (2 * C) * CONVS
    print(f"dense C=128      : {dt*1e3:8.3f} ms  raw    {all_flops/dt/1e12:6.1f} TFLOP/s")

    # D: batch-2 C=64 chain with shared weights (upper bound if weights
    # could be shared across directions)
    x2 = jnp.concatenate([xb, xf], axis=0)

    def batch2(x, *ws):
        for wv in ws[:CONVS]:
            x = jnp.maximum(conv(x, wv), 0)
        return jnp.sum(x)

    dt = timed(jax.jit(batch2), (x2, *wb))
    print(f"batch2  C=64     : {dt*1e3:8.3f} ms  useful {useful_flops/dt/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    sys.exit(main())
