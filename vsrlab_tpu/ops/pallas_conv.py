"""Fused residual conv-pair Pallas kernel (BasicVSR recurrence hot path).

The BasicVSR propagation cell is a chain of ``ResidualConv`` units
(``x + conv2(relu(conv1(x)))``, 3×3, C=64 — reference
src/core/modules/conv.py:82-103) running at batch 1 inside the time
recurrence (reference src/vsr/models/RealBasicVSR/modules/basicvsr.py:46-83).
XLA executes those convs at ~18 TFLOP/s at batch 1 on v5e (measured,
docs/tpu_kernel_notes.md); the MXU ceiling for K=C=64/N=64 shapes is ~25%
of peak ≈ 49 TFLOP/s. This kernel fuses one full residual unit into a
single VMEM pass:

* the activation plane (H·W·64 bf16 ≈ 7.4 MB at 180×320) is VMEM-resident
  for both convs — no HBM round-trip between conv1 and conv2;
* each 3×3 conv is 9 shifted matmuls ``(rows·W, C) @ (C, C)`` with fp32
  accumulation in VMEM scratch;
* zero-padding semantics come from a caller-side 2-row/1-col zero pad and
  static column slices — no masks in the inner loop (row masks only zero
  the conv1 halo rows at the image boundary);
* rows are processed in blocks so the fp32 accumulators stay small.

Forward-only (the bench/serving path); training keeps the XLA lowering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot2d(a2d, w, out_rows, out_w, c):
    y = jax.lax.dot(a2d, w, preferred_element_type=jnp.float32)
    return y.reshape(out_rows, out_w, c)


def _residual_pair_kernel(
    xp_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
    y_ref, acc1_ref, acc2_ref, *, H, W, C, BR,
):
    nblk = H // BR

    def body(i, carry):
        r0 = i * BR

        # conv1 → y image rows [r0-1, r0+BR+1) (one halo row each side)
        acc1_ref[...] = jnp.broadcast_to(
            b1_ref[0].astype(jnp.float32), (BR + 2, W, C)
        )
        for dy in range(3):
            xs = xp_ref[0, pl.ds(r0 + dy, BR + 2)]  # (BR+2, W+2, C)
            for dx in range(3):
                xss = xs[:, dx : dx + W, :].reshape((BR + 2) * W, C)
                acc1_ref[...] += _dot2d(xss, w1_ref[dy, dx], BR + 2, W, C)

        # zero the halo rows that fall outside the image (y's zero pad)
        q = jax.lax.broadcasted_iota(jnp.int32, (BR + 2, 1, 1), 0) + (r0 - 1)
        valid = jnp.logical_and(q >= 0, q < H)
        yv = jnp.where(valid, jnp.maximum(acc1_ref[...], 0.0), 0.0)
        y_ref[:, 1 : W + 1, :] = yv.astype(y_ref.dtype)
        y_ref[:, 0:1, :] = jnp.zeros((BR + 2, 1, C), y_ref.dtype)
        y_ref[:, W + 1 : W + 2, :] = jnp.zeros((BR + 2, 1, C), y_ref.dtype)

        # conv2 + residual → out image rows [r0, r0+BR)
        acc2_ref[...] = jnp.broadcast_to(
            b2_ref[0].astype(jnp.float32), (BR, W, C)
        )
        yb = y_ref[...]
        for dy in range(3):
            for dx in range(3):
                yss = yb[dy : dy + BR, dx : dx + W, :].reshape(BR * W, C)
                acc2_ref[...] += _dot2d(yss, w2_ref[dy, dx], BR, W, C)

        res = xp_ref[0, pl.ds(r0 + 2, BR), 1 : W + 1, :]
        out_ref[0, pl.ds(r0, BR)] = res + acc2_ref[...].astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, nblk, body, 0)


@functools.partial(
    jax.jit, static_argnames=("block_rows", "interpret")
)
def residual_conv_pair(x, w1, b1, w2, b2, block_rows: int = 12, interpret: bool = False):
    """``x + conv2(relu(conv1(x)))`` with 3×3 zero-pad convs, fused.

    Args:
      x: ``(B, H, W, C)``; compute dtype follows ``x.dtype`` (bf16 on TPU),
        accumulation is fp32.
      w1, w2: ``(3, 3, C, C)`` flax conv kernels (kh, kw, cin, cout).
      b1, b2: ``(C,)`` biases.
      block_rows: rows per VMEM block; must divide H.
    """
    B, H, W, C = x.shape
    assert H % block_rows == 0, (H, block_rows)
    dt = x.dtype
    xp = jnp.pad(x, ((0, 0), (2, 2), (1, 1), (0, 0)))
    kern = functools.partial(
        _residual_pair_kernel, H=H, W=W, C=C, BR=block_rows
    )
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H + 4, W + 2, C), lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), dt),
        scratch_shapes=[
            pltpu.VMEM((block_rows + 2, W + 2, C), dt),
            pltpu.VMEM((block_rows + 2, W, C), jnp.float32),
            pltpu.VMEM((block_rows, W, C), jnp.float32),
        ],
        interpret=interpret,
    )(
        xp,
        w1.astype(dt),
        b1.reshape(1, C),
        w2.astype(dt),
        b2.reshape(1, C),
    )


def _residual_pair_im2col_kernel(
    xp_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
    y_ref, patch_ref, *, H, W, C, BR,
):
    """im2col variant: one (M, 9C) @ (9C, C) matmul per conv — packs the
    MXU K dimension to 576 instead of nine K=64 matmuls."""
    nblk = H // BR

    def body(i, carry):
        r0 = i * BR

        # conv1: patches for y rows [r0-1, r0+BR+1)
        for dy in range(3):
            xs = xp_ref[0, pl.ds(r0 + dy, BR + 2)]  # (BR+2, W+2, C)
            for dx in range(3):
                k = dy * 3 + dx
                patch_ref[:, k * C : (k + 1) * C] = xs[:, dx : dx + W, :].reshape(
                    (BR + 2) * W, C
                )
        acc = jax.lax.dot(
            patch_ref[...], w1_ref[...], preferred_element_type=jnp.float32
        ).reshape(BR + 2, W, C) + b1_ref[0].astype(jnp.float32)

        q = jax.lax.broadcasted_iota(jnp.int32, (BR + 2, 1, 1), 0) + (r0 - 1)
        valid = jnp.logical_and(q >= 0, q < H)
        yv = jnp.where(valid, jnp.maximum(acc, 0.0), 0.0)
        y_ref[:, 1 : W + 1, :] = yv.astype(y_ref.dtype)
        y_ref[:, 0:1, :] = jnp.zeros((BR + 2, 1, C), y_ref.dtype)
        y_ref[:, W + 1 : W + 2, :] = jnp.zeros((BR + 2, 1, C), y_ref.dtype)

        # conv2: patches for out rows [r0, r0+BR)
        yb = y_ref[...]
        for dy in range(3):
            for dx in range(3):
                k = dy * 3 + dx
                patch_ref[: BR * W, k * C : (k + 1) * C] = yb[
                    dy : dy + BR, dx : dx + W, :
                ].reshape(BR * W, C)
        acc2 = jax.lax.dot(
            patch_ref[: BR * W], w2_ref[...], preferred_element_type=jnp.float32
        ).reshape(BR, W, C) + b2_ref[0].astype(jnp.float32)

        res = xp_ref[0, pl.ds(r0 + 2, BR), 1 : W + 1, :]
        out_ref[0, pl.ds(r0, BR)] = res + acc2.astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, nblk, body, 0)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def residual_conv_pair_im2col(
    x, w1, b1, w2, b2, block_rows: int = 12, interpret: bool = False
):
    """im2col formulation of :func:`residual_conv_pair` (same semantics)."""
    B, H, W, C = x.shape
    assert H % block_rows == 0, (H, block_rows)
    dt = x.dtype
    xp = jnp.pad(x, ((0, 0), (2, 2), (1, 1), (0, 0)))
    kern = functools.partial(
        _residual_pair_im2col_kernel, H=H, W=W, C=C, BR=block_rows
    )
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H + 4, W + 2, C), lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), dt),
        scratch_shapes=[
            pltpu.VMEM((block_rows + 2, W + 2, C), dt),
            pltpu.VMEM(((block_rows + 2) * W, 9 * C), dt),
        ],
        interpret=interpret,
    )(
        xp,
        w1.astype(dt).reshape(9 * C, C),
        b1.reshape(1, C),
        w2.astype(dt).reshape(9 * C, C),
        b2.reshape(1, C),
    )


def residual_conv_pair_xla(x, w1, b1, w2, b2):
    """XLA reference lowering of the same unit (numeric oracle + baseline)."""
    dt = x.dtype
    dn = jax.lax.conv_dimension_numbers(x.shape, w1.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, w1.astype(dt), (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    y = jnp.maximum(y + b1.astype(jnp.float32), 0.0).astype(dt)
    z = jax.lax.conv_general_dilated(
        y, w2.astype(dt), (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    return x + (z + b2.astype(jnp.float32)).astype(dt)
