"""Microbench: two-frame channel packing of the POST-UPSAMPLE tail
(``conv_hr`` + ``conv_last`` at the 720p output resolution).

Follow-up to the adopted cleaner frame packing (bench_frame_pack.py,
docs/tpu_kernel_notes.md round-5): ``conv_hr`` is a 3x3 C=64->64 conv at
720x1280 — 68 GFLOP/frame, half the MXU lanes, batched over b*t frames —
exactly the geometry the cleaner win came from, just with 16x the M-rows
per frame (already deep, so the pipeline-depth half of the win may
already be banked). ``conv_last`` (64->3) rides along because the packed
layout reaches it anyway; its lanes go 3->6 at 2x the FLOPs (expected
wash on its ~3 GFLOP/frame). The upsample convs are NOT candidates:
their N=256 output lanes are already full, so block-diag packing would
halve their useful rate.

Decision rule: packed wins iff the packed chain's wall time beats the
batched C=64 chain. Result goes to docs/tpu_kernel_notes.md
(adopt-or-refute).

Run: python scripts/bench_tail_pack.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, C, BT = 720, 1280, 64, 10


def timed(fn, args, iters=5):
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


def blockdiag(w):
    kh, kw, ci, co = w.shape
    z = jnp.zeros((kh, kw, 2 * ci, 2 * co), w.dtype)
    return z.at[:, :, :ci, :co].set(w).at[:, :, ci:, co:].set(w)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BT, H, W, C)) * 0.1, jnp.bfloat16)
    w_hr = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
    w_last = jnp.asarray(rng.standard_normal((3, 3, C, 3)) * 0.05, jnp.bfloat16)

    @jax.jit
    def plain(x, w_hr, w_last):
        h = jax.nn.leaky_relu(conv(x, w_hr), 0.1)
        return conv(h, w_last)

    @jax.jit
    def packed(x, w_hr, w_last):
        n = x.shape[0]
        xp = jnp.concatenate([x[: n // 2], x[n // 2:]], axis=-1)
        h = jax.nn.leaky_relu(conv(xp, blockdiag(w_hr)), 0.1)
        yp = conv(h, blockdiag(w_last))
        return jnp.concatenate([yp[..., :3], yp[..., 3:]], axis=0)

    @jax.jit
    def packed_hr_only(x, w_hr, w_last):
        n = x.shape[0]
        xp = jnp.concatenate([x[: n // 2], x[n // 2:]], axis=-1)
        h = jax.nn.leaky_relu(conv(xp, blockdiag(w_hr)), 0.1)
        h = jnp.concatenate([h[..., :C], h[..., C:]], axis=0)
        return conv(h, w_last)

    ref = plain(x, w_hr, w_last)
    got = packed(x, w_hr, w_last)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    print(f"packed-vs-plain max abs err: {err:.2e}")

    gflop_hr = 2 * H * W * 9 * C * C * BT / 1e9
    gflop_last = 2 * H * W * 9 * C * 3 * BT / 1e9
    useful = (gflop_hr + gflop_last) / 1e3  # TFLOP

    for name, fn in [("plain b10 C=64", plain),
                     ("packed b5 C=128 (hr+last)", packed),
                     ("packed hr only, plain last", packed_hr_only)]:
        dt = timed(fn, (x, w_hr, w_last))
        print(f"{name:30s} {dt * 1e3:8.2f} ms   useful {useful / dt:6.1f} TF/s")


if __name__ == "__main__":
    main()
