"""Probe: int8 MXU conv throughput vs bf16 at the model's hot shape.

v5e's MXU runs 8-bit matmuls at ~2x the bf16 rate (394 vs 197 TOPS
peak). The RealBasicVSR hot phases are C=64 3x3 conv chains measured at
~38 TF/s bf16 (lane-occupancy-limited, docs/tpu_kernel_notes.md). This
measures whether int8 inputs + int32 accumulation lift the chain rate
enough to justify a quantized inference mode.

Run: python scripts/bench_int8_conv.py
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from vsrlab_tpu.utils import enable_compilation_cache  # noqa: E402

H, W, C, N = 180, 320, 64, 20  # N chained 3x3 convs, batch 10 frames
B = 10


def timed(fn, *args):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / 5)
    return best


def conv(x, w, acc_dtype):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype,
    )


@partial(jax.jit, static_argnums=(2,))
def chain_bf16(x, ws, n):
    for i in range(n):
        x = conv(x, ws[i], jnp.float32).astype(jnp.bfloat16)
    return x


@partial(jax.jit, static_argnums=(2,))
def chain_int8(x, ws, n):
    for i in range(n):
        y = conv(x, ws[i], jnp.int32)
        # cheap requant: shift back to int8 range (stand-in for
        # per-channel scales; the arithmetic cost is representative)
        x = jnp.clip(y >> 7, -128, 127).astype(jnp.int8)
    return x


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    xf = jnp.asarray(rng.random((B, H, W, C)), jnp.bfloat16)
    wf = jnp.asarray(rng.random((N, 3, 3, C, C)) - 0.5, jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 127, (B, H, W, C)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 127, (N, 3, 3, C, C)), jnp.int8)

    flops = 2 * B * H * W * C * C * 9 * N
    t_bf = timed(chain_bf16, xf, wf, N)
    print(f"bf16 chain:  {t_bf*1e3:7.2f} ms  {flops/t_bf/1e12:6.1f} TFLOP/s")
    t_i8 = timed(chain_int8, xi, wi, N)
    print(f"int8 chain:  {t_i8*1e3:7.2f} ms  {flops/t_i8/1e12:6.1f} TOP/s "
          f"({t_bf/t_i8:.2f}x vs bf16)")


if __name__ == "__main__":
    main()
