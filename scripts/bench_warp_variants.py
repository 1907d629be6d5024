"""Cost-model experiments for the XLA warp gather at the SpyNet shape.

Measured (v5e, 18x192x320x3 fp32, border pad):
- cost scales with GATHER COUNT: nearest (1 gather) 10.8 ms vs bilinear
  (4 gathers) 34.3 ms; flow magnitude/locality irrelevant; channel pad
  3->8 irrelevant.
- a single global `jnp.take` over the fully flattened (N*H*W, C) rows is
  ~34% faster than batched `take_along_axis` for the same 4 corners.
- packing the 2x2 interpolation window into gather-row lanes (this file)
  trades 4 gathers for 1 gather of wider rows + a one-hot lane select.

Run: python scripts/bench_warp_variants.py
"""

from __future__ import annotations

import sys
import time

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


N, H, W, C = 18, 192, 320, 3


def _coords(f):
    grid_y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)[None]
    grid_x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)[None]
    ix = jnp.clip(grid_x + f[..., 0], 0.0, W - 1)
    iy = jnp.clip(grid_y + f[..., 1], 0.0, H - 1)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    return ix, iy, x0, y0


def flat4(x, f):
    """4 corners via one flattened take each (axis 0 of (N*H*W, C))."""
    ix, iy, x0, y0 = _coords(f)
    wx1 = ix - x0
    wy1 = iy - y0
    xf = x.reshape(N * H * W, C)
    base = (jnp.arange(N, dtype=jnp.int32) * (H * W))[:, None, None]
    out = 0.0
    for dy, wy in ((0, 1 - wy1), (1, wy1)):
        for dx, wx in ((0, 1 - wx1), (1, wx1)):
            yy = jnp.clip(y0 + dy, 0, H - 1).astype(jnp.int32)
            xx = jnp.clip(x0 + dx, 0, W - 1).astype(jnp.int32)
            lin = (base + yy * W + xx).reshape(-1)
            vals = jnp.take(xf, lin, axis=0).reshape(N, H, W, C)
            out = out + vals * (wy * wx)[..., None]
    return out


def make_packed(gp):
    wg = W // gp
    kwin = 2 * gp

    def packed(x, f):
        """One flattened take of (2 rows x 2 x-groups) packed rows + one-hot
        lane select. Row layout: [y:(g0,g0+1), y+1:(g0,g0+1)] each gp*C."""
        ix, iy, x0, y0 = _coords(f)
        x0i = jnp.minimum(x0.astype(jnp.int32), W - 2)
        y0i = jnp.minimum(y0.astype(jnp.int32), H - 2)
        wx1 = ix - x0i
        wy1 = iy - y0i
        g0 = jnp.minimum(x0i // gp, wg - 2)
        r0 = x0i - g0 * gp

        xp = x.reshape(N, H, wg, gp * C)
        xp2 = jnp.concatenate([xp[:, :, :-1], xp[:, :, 1:]], axis=-1)
        xp4 = jnp.concatenate([xp2[:, :-1], xp2[:, 1:]], axis=-1)
        # (N, H-1, wg-1, 4*gp*C) flattened rows
        xf = xp4.reshape(N * (H - 1) * (wg - 1), 4 * gp * C)
        base = (jnp.arange(N, dtype=jnp.int32) * ((H - 1) * (wg - 1)))[
            :, None, None
        ]
        lin = (base + y0i * (wg - 1) + g0).reshape(-1)
        g = jnp.take(xf, lin, axis=0).reshape(N, H, W, 2, kwin, C)

        k = jnp.arange(kwin, dtype=jnp.int32)
        sel0 = (k[None, None, None] == r0[..., None]).astype(x.dtype)
        sel1 = (k[None, None, None] == (r0 + 1)[..., None]).astype(x.dtype)
        selx = sel0 * (1 - wx1)[..., None] + sel1 * wx1[..., None]
        sely = jnp.stack([1 - wy1, wy1], axis=-1)
        w2 = sely[..., :, None] * selx[..., None, :]  # (N,H,W,2,kwin)
        return jnp.einsum("nhwyk,nhwykc->nhwc", w2, g)

    return packed


def xpair_flat(x, f):
    """2 takes (y0/y1 rows) of x-pair-packed rows + one-hot select."""
    gp = 4
    wg = W // gp
    kwin = 2 * gp
    ix, iy, x0, y0 = _coords(f)
    x0i = jnp.minimum(x0.astype(jnp.int32), W - 2)
    y0i = y0.astype(jnp.int32)
    wx1 = ix - x0i
    wy1 = iy - y0i
    g0 = jnp.minimum(x0i // gp, wg - 2)
    r0 = x0i - g0 * gp

    xp = x.reshape(N, H, wg, gp * C)
    xp2 = jnp.concatenate([xp[:, :, :-1], xp[:, :, 1:]], axis=-1)
    xf = xp2.reshape(N * H * (wg - 1), kwin * C)
    base = (jnp.arange(N, dtype=jnp.int32) * (H * (wg - 1)))[:, None, None]

    k = jnp.arange(kwin, dtype=jnp.int32)
    sel0 = (k[None, None, None] == r0[..., None]).astype(x.dtype)
    sel1 = (k[None, None, None] == (r0 + 1)[..., None]).astype(x.dtype)
    selx = sel0 * (1 - wx1)[..., None] + sel1 * wx1[..., None]

    out = 0.0
    for dy, wy in ((0, 1 - wy1), (1, wy1)):
        yy = jnp.clip(y0i + dy, 0, H - 1)
        lin = (base + yy * (wg - 1) + g0).reshape(-1)
        g = jnp.take(xf, lin, axis=0).reshape(N, H, W, kwin, C)
        v = jnp.einsum("nhwk,nhwkc->nhwc", selx, g)
        out = out + v * wy[..., None]
    return out


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, H, W, C)), jnp.float32)
    flow = jnp.asarray(rng.normal(0, 5, (N, H, W, 2)), jnp.float32)

    @jax.jit
    def baseline(x, f):
        return flow_warp(x, f, padding_mode="border")

    ref = baseline(x, flow)
    print(f"shape ({N},{H},{W},{C}) fp32, border pad:")
    print(f"  take_along_axis 4-corner (prod) : {timed(baseline, x, flow)*1e3:7.2f} ms")

    for name, fn in [
        ("flat4 global take", flat4),
        ("packed gp=4 single take", make_packed(4)),
        ("packed gp=8 single take", make_packed(8)),
        ("xpair 2 takes gp=4", xpair_flat),
    ]:
        jf = jax.jit(fn)
        got = jf(x, flow)
        err = float(jnp.max(jnp.abs(ref - got)))
        print(f"  {name:31s}: {timed(jf, x, flow)*1e3:7.2f} ms (err {err:.1e})")


if __name__ == "__main__":
    main()
