"""Microbench + oracle: SpyNet head 7x7 convs via space-to-depth.

A stride-1 7x7 conv on (N,H,W,C) is exactly a 5x5 conv on the
space-to-depth-by-2 tensor (N,H/2,W/2,4C) with a derived kernel
(2.04x nominal FLOPs from zero taps, but 4x the channel width -> full
MXU lanes). Validates exactness vs lax.conv and measures the head chain.

Run: python scripts/bench_spynet_s2d.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N, H, W = 18, 192, 320
CHS = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]


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


def conv_plain(x, w, k=7):
    p = k // 2
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(p, p), (p, p)], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def s2d(x):
    n, h, w, c = x.shape
    return (
        x.reshape(n, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h // 2, w // 2, 4 * c)
    )


def d2s(y):
    n, h2, w2, c4 = y.shape
    c = c4 // 4
    return (
        y.reshape(n, h2, w2, 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h2 * 2, w2 * 2, c)
    )


def derive_s2d_kernel(w):
    """(7,7,Ci,Co) -> (5,5,4Ci,4Co) so conv5x5(s2d(x), W') == s2d(conv7x7(x, w))."""
    kh, kw, ci, co = w.shape
    assert kh == kw == 7
    wp = np.zeros((5, 5, 4 * ci, 4 * co), np.float32)
    wnp = np.asarray(w, np.float32)
    for py in range(2):
        for px in range(2):
            for dy in range(7):
                for dx in range(7):
                    qy, ry = divmod(py + dy - 3, 2)
                    qx, rx = divmod(px + dx - 3, 2)
                    wp[qy + 2, qx + 2,
                       (ry * 2 + rx) * ci:(ry * 2 + rx + 1) * ci,
                       (py * 2 + px) * co:(py * 2 + px + 1) * co] += wnp[dy, dx]
    return jnp.asarray(wp)


def conv_s2d(xs, wp):
    dn = jax.lax.conv_dimension_numbers(xs.shape, wp.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        xs, wp, (1, 1), [(2, 2), (2, 2)], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    ).astype(xs.dtype)


def main():
    rng = np.random.default_rng(0)

    # exactness (fp32)
    x = jnp.asarray(rng.standard_normal((2, 16, 20, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, 8, 32)) * 0.1, jnp.float32)
    want = conv_plain(x, w)
    got = d2s(conv_s2d(s2d(x), derive_s2d_kernel(w)))
    err = float(jnp.max(jnp.abs(got - want)))
    print(f"s2d exactness (fp32): max|d| = {err:.3e}")
    assert err < 1e-4, err

    # perf: head chain at bench level-5 shape, bf16
    ws = [
        jnp.asarray(rng.standard_normal((7, 7, ci, co)) * 0.05, jnp.bfloat16)
        for ci, co in CHS
    ]
    wps = [derive_s2d_kernel(w).astype(jnp.bfloat16) for w in ws]
    x0 = jnp.asarray(rng.standard_normal((N, H, W, 8)) * 0.1, jnp.bfloat16)
    fl = sum(2 * N * H * W * 49 * ci * co for ci, co in CHS)

    def head_plain(x, *ws):
        for i, w in enumerate(ws):
            x = conv_plain(x, w)
            if i < len(ws) - 1:
                x = jnp.maximum(x, 0)
        return x

    def head_s2d(x, *wps):
        xs = s2d(x)
        for i, wp in enumerate(wps):
            xs = conv_s2d(xs, wp)
            if i < len(wps) - 1:
                xs = jnp.maximum(xs, 0)
        return d2s(xs)

    d1 = timed(jax.jit(head_plain), (x0, *ws))
    d2_ = timed(jax.jit(head_s2d), (x0, *wps))
    a = jax.jit(head_plain)(x0, *ws)
    b = jax.jit(head_s2d)(x0, *wps)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"head plain: {d1*1e3:7.3f} ms  {fl/d1/1e12:5.1f} TF/s")
    print(f"head s2d  : {d2_*1e3:7.3f} ms  {fl/d2_/1e12:5.1f} TF/s useful  max|d|={err:.3e}")


if __name__ == "__main__":
    sys.exit(main())
