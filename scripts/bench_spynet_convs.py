"""Microbench the SpyNet per-level head (5x 7x7 convs, 8->32->64->32->16->2)
at the bench's level-5 shape, per conv, vs an explicit patches+matmul
formulation. Real jit arguments throughout.

Run: python scripts/bench_spynet_convs.py
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


def conv7(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(3, 3), (3, 3)], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def patches_dot(x, w):
    """7x7 conv as extract_patches + one matmul."""
    cin, cout = w.shape[2], w.shape[3]
    p = jax.lax.conv_general_dilated_patches(
        x, (7, 7), (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (N, H, W, cin*49), channel-major: cin outer or taps outer?
    y = jax.lax.dot_general(
        p.reshape(-1, cin * 49), w_to_patch(w),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return y.reshape(x.shape[0], x.shape[1], x.shape[2], cout).astype(x.dtype)


def w_to_patch(w):
    # conv_general_dilated_patches output feature dim is ordered
    # (cin, kh, kw) — match by transposing HWIO -> (I, H, W, O)
    kh, kw, cin, cout = w.shape
    return w.transpose(2, 0, 1, 3).reshape(cin * kh * kw, cout)


def main():
    rng = np.random.default_rng(0)
    print(f"shape: {N}x{H}x{W}")
    for cin, cout in CHS:
        x = jnp.asarray(rng.standard_normal((N, H, W, cin)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((7, 7, cin, cout)) * 0.05, jnp.bfloat16)
        fl = 2 * N * H * W * 49 * cin * cout
        d1 = timed(jax.jit(conv7), (x, w))
        d2 = timed(jax.jit(patches_dot), (x, w))
        ok = np.allclose(
            np.asarray(jax.jit(conv7)(x, w), np.float32),
            np.asarray(jax.jit(patches_dot)(x, w), np.float32),
            rtol=0.05, atol=0.05,
        )
        print(
            f"{cin:3d}->{cout:3d}: conv {d1*1e3:7.3f} ms {fl/d1/1e12:5.1f} TF/s"
            f" | patches {d2*1e3:7.3f} ms {fl/d2/1e12:5.1f} TF/s | match={ok}"
        )

    # full 5-conv head, both ways
    ws = [
        jnp.asarray(rng.standard_normal((7, 7, ci, co)) * 0.05, jnp.bfloat16)
        for ci, co in CHS
    ]
    x0 = jnp.asarray(rng.standard_normal((N, H, W, 8)) * 0.1, jnp.bfloat16)
    fl_head = sum(2 * N * H * W * 49 * ci * co for ci, co in CHS)

    def head_conv(x, *ws):
        for i, w in enumerate(ws):
            x = conv7(x, w)
            if i < len(ws) - 1:
                x = jnp.maximum(x, 0)
        return x

    def head_patch(x, *ws):
        for i, w in enumerate(ws):
            x = patches_dot(x, w)
            if i < len(ws) - 1:
                x = jnp.maximum(x, 0)
        return x

    d1 = timed(jax.jit(head_conv), (x0, *ws))
    d2 = timed(jax.jit(head_patch), (x0, *ws))
    print(f"head conv   : {d1*1e3:7.3f} ms {fl_head/d1/1e12:5.1f} TF/s")
    print(f"head patches: {d2*1e3:7.3f} ms {fl_head/d2/1e12:5.1f} TF/s")


if __name__ == "__main__":
    sys.exit(main())
