"""Measure flow_warp cost vs channel count / gather dtype on the chip.

Round-2 measured that C=3 warp gathers are SLOWER than C=8 (34 vs 28 ms
at 18x192x320 — per-row gather overhead dominates at tiny C). This bench
pins the best padded width for the SpyNet pyramid warps (C=3 images) and
whether gathering in bf16 (half the bytes) pays at the recurrence width
(C=64), measured with pad+slice overhead INCLUDED as the caller would
run it.

Run: python scripts/bench_warp_channels.py
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from vsrlab_tpu.ops.warp import flow_warp  # noqa: E402
from vsrlab_tpu.utils import enable_compilation_cache  # noqa: E402


def timed(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)

    # SpyNet finest-level shape: 18 pairs (2 dirs x 9), 192x320, C=3 fp32
    n, h, w = 18, 192, 320
    x3 = jnp.asarray(rng.random((n, h, w, 3)), jnp.float32)
    flow = jnp.asarray(rng.normal(0, 5, (n, h, w, 2)), jnp.float32)

    @jax.jit
    def warp_plain(x, f):
        return flow_warp(x, f, padding_mode="border")

    print(f"SpyNet-level shape ({n},{h},{w}) fp32, border pad:")
    print(f"  C=3 direct        : {timed(warp_plain, x3, flow)*1e3:7.2f} ms")

    for cpad in (4, 8, 16):
        @jax.jit
        def warp_padded(x, f, cpad=cpad):
            xp = jnp.pad(x, ((0, 0),) * 3 + ((0, cpad - x.shape[-1]),))
            return flow_warp(xp, f, padding_mode="border")[..., : x.shape[-1]]

        print(f"  C=3 padded to {cpad:2d}  : {timed(warp_padded, x3, flow)*1e3:7.2f} ms")

    # recurrence shape: per-frame C=64 bf16 feature warp
    xr = jnp.asarray(rng.random((1, 180, 320, 64)), jnp.bfloat16)
    fr = jnp.asarray(rng.normal(0, 5, (1, 180, 320, 2)), jnp.float32)

    @jax.jit
    def warp_rec(x, f):
        return flow_warp(x, f)

    # 20 chained warps approximate the scan's per-step warps
    @jax.jit
    def warp_rec20(x, f):
        for _ in range(20):
            x = flow_warp(x, f)
        return x

    print("recurrence shape (1,180,320,64) bf16, zeros pad:")
    print(f"  single warp       : {timed(warp_rec, xr, fr)*1e3:7.2f} ms")
    print(f"  20 chained        : {timed(warp_rec20, xr, fr)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
