"""Microbench: fused Pallas residual conv-pair vs XLA, real v5e chip.

Measures a chain of residual units at the BasicVSR recurrence shape
(batch 1, 180×320, C=64, bf16) with tensors passed as jit ARGUMENTS
(closure-captured inputs get constant-folded — docs/tpu_kernel_notes.md).

Run: python scripts/bench_pallas_conv.py [block_rows ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from vsrlab_tpu.ops.pallas_conv import (  # noqa: E402
    residual_conv_pair,
    residual_conv_pair_im2col,
    residual_conv_pair_xla,
)

H, W, C, PAIRS = 180, 320, 64, 10
FLOPS = PAIRS * 2 * 2 * H * W * (9 * C) * C  # 2 convs per pair


def timed(fn, args, iters=10):
    out = fn(*args)
    float(jnp.sum(out[-1] if isinstance(out, tuple) else out))  # sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn(*args)
        float(jnp.sum(o))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    block_rows_list = [int(a) for a in sys.argv[1:]] or [12, 20, 36]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.bfloat16)
    ws = [
        (
            jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16),
            jnp.asarray(rng.standard_normal((C,)) * 0.05, jnp.float32),
            jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16),
            jnp.asarray(rng.standard_normal((C,)) * 0.05, jnp.float32),
        )
        for _ in range(PAIRS)
    ]
    flat = [t for tup in ws for t in tup]

    def chain_xla(x, *flat):
        for i in range(PAIRS):
            w1, b1, w2, b2 = flat[4 * i : 4 * i + 4]
            x = residual_conv_pair_xla(x, w1, b1, w2, b2)
        return x

    jit_xla = jax.jit(chain_xla)
    dt = timed(jit_xla, (x, *flat))
    print(f"XLA chain      : {dt*1e3:8.3f} ms  {FLOPS/dt/1e12:6.1f} TFLOP/s")
    ref = jit_xla(x, *flat)

    for name, fn in (("taps", residual_conv_pair), ("im2col", residual_conv_pair_im2col)):
        for br in block_rows_list:
            if H % br:
                continue

            def chain_pl(x, *flat, _br=br, _fn=fn):
                for i in range(PAIRS):
                    w1, b1, w2, b2 = flat[4 * i : 4 * i + 4]
                    x = _fn(x, w1, b1, w2, b2, block_rows=_br)
                return x

            try:
                jit_pl = jax.jit(chain_pl)
                dt = timed(jit_pl, (x, *flat))
                got = jit_pl(x, *flat)
                ref32 = ref.astype(jnp.float32)
                err = float(
                    jnp.max(jnp.abs(got.astype(jnp.float32) - ref32))
                    / (float(jnp.max(jnp.abs(ref32))) + 1e-9)
                )
                print(
                    f"Pallas {name:6s} br={br:3d} : {dt*1e3:8.3f} ms  "
                    f"{FLOPS/dt/1e12:6.1f} TFLOP/s  rel|Δ|={err:.3e}"
                )
            except Exception as e:  # Mosaic compile failures are data too
                print(
                    f"Pallas {name:6s} br={br:3d} : FAILED: "
                    f"{type(e).__name__}: {str(e)[:200]}"
                )


if __name__ == "__main__":
    main()
