"""Probe: Pallas row-gather for the deform packed-window take (VERDICT r3 #3).

The full-VRT deformable alignment bottleneck is the packed-window gather:
per (frame-pair, offset-group) image the bilinear sampler builds a packed
table ``xf`` of shape ((h-1)*(wg-1), 4*gp*cg) = (8001, 80) bf16 at the
adopted gp=2 layout — 1.28 MB, which FITS VMEM — and gathers ho*wo=16384
rows per tap with ONE flattened ``jnp.take`` (XLA: ~7 ns/row from HBM,
measured round 3). The round-2 Pallas ruling in ops/warp.py ("Mosaic
dynamic_gather is single-vreg only") predates this row-packed layout: an
80-lane row is within one vreg, so a PER-ROW dynamic gather over the
packed tensor is the one formulation never measured. This probe answers:

  xla_take      the shipped formulation (gather from HBM, XLA fusions)
  pallas_take   Pallas kernel: xf block resident in VMEM, vectorized
                jnp.take along the row (sublane) axis inside the kernel
  pallas_fused  same + the bilinear one-hot select fused in-kernel
                (weights built from compact coords, lane-expanded by
                iota compares), emitting the lane-wise product

Shapes are the exact full-VRT alignment tile (n=15 pairs, G=12 groups,
cg=10, 128x128, 9 taps, gp=2, bf16 — scripts/bench_deform_fullscale.py).

Run: python scripts/bench_pallas_deform_gather.py  (real TPU)
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from vsrlab_tpu.utils import enable_compilation_cache  # noqa: E402

N_IMG = 15 * 12  # n * groups
H = W = 128
CG = 10
GP = 2
TAPS = 9
WG = W // GP  # 64
ROWS = (H - 1) * (WG - 1)  # 8001
ROW_W = 4 * GP * CG  # 80
N_IDX = H * W  # 16384 output pixels per (img, tap)


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    xf = jnp.asarray(rng.standard_normal((N_IMG, ROWS, ROW_W)), jnp.bfloat16)
    idx = jnp.asarray(
        rng.integers(0, ROWS, size=(N_IMG, TAPS, N_IDX)), jnp.int32
    )
    # compact per-pixel bilinear metadata (what the fused kernel consumes)
    rx0 = jnp.asarray(rng.integers(0, GP, size=(N_IMG, TAPS, N_IDX)), jnp.int32)
    py0 = jnp.asarray(rng.integers(0, 2, size=(N_IMG, TAPS, N_IDX)), jnp.int32)
    wx1 = jnp.asarray(rng.random((N_IMG, TAPS, N_IDX)), jnp.float32)
    wy1 = jnp.asarray(rng.random((N_IMG, TAPS, N_IDX)), jnp.float32)
    return xf, idx, rx0, py0, wx1, wy1


# --------------------------------------------------------------------------
# baseline: the shipped XLA formulation
# --------------------------------------------------------------------------


@jax.jit
def xla_take(xf, idx):
    """One flattened take, like ops/warp.py _bilinear_packed."""
    base = (jnp.arange(N_IMG, dtype=jnp.int32) * ROWS)[:, None, None]
    lin = (idx + base).reshape(-1)
    g = jnp.take(xf.reshape(-1, ROW_W), lin, axis=0)
    return g.reshape(N_IMG, TAPS, N_IDX, ROW_W)


@jax.jit
def xla_take_fused(xf, idx, rx0, py0, wx1, wy1):
    g = xla_take(xf, idx)  # (img, tap, pix, 80)
    g = jax.lax.optimization_barrier(g).astype(jnp.float32)
    k = jnp.arange(2 * GP, dtype=jnp.int32)
    ky = jnp.arange(2, dtype=jnp.int32)
    selx = (1.0 - wx1)[..., None] * (k == rx0[..., None]) + wx1[..., None] * (
        k == (rx0 + 1)[..., None]
    )
    sely = (1.0 - wy1)[..., None] * (ky == py0[..., None]) + wy1[..., None] * (
        ky == (py0 + 1)[..., None]
    )
    w2 = sely[..., :, None] * selx[..., None, :]
    gw = g.reshape(g.shape[:-1] + (2, 2 * GP, CG))
    return jnp.einsum("...yk,...ykc->...c", w2, gw).astype(jnp.bfloat16)


# --------------------------------------------------------------------------
# pallas kernels
# --------------------------------------------------------------------------


def _take_kernel(idx_ref, xf_ref, out_ref):
    idx = idx_ref[0, 0, :]
    out_ref[0, 0] = jnp.take(xf_ref[0], idx, axis=0)


def pallas_take(xf, idx):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        _take_kernel,
        grid=(N_IMG, TAPS),
        in_specs=[
            pl.BlockSpec((1, 1, N_IDX), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, ROW_W), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, N_IDX, ROW_W), lambda i, t: (i, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (N_IMG, TAPS, N_IDX, ROW_W), xf.dtype
        ),
    )(idx, xf)


def _fused_kernel(idx_ref, rx0_ref, py0_ref, wx1_ref, wy1_ref, xf_ref, out_ref):
    idx = idx_ref[0, 0, :]
    g = jnp.take(xf_ref[0], idx, axis=0).astype(jnp.float32)  # (pix, 80)
    lane = jax.lax.broadcasted_iota(jnp.int32, (N_IDX, ROW_W), 1)
    x_slot = (lane // CG) % (2 * GP)
    y_slot = lane // (2 * GP * CG)
    rx0 = rx0_ref[0, 0, :][:, None]
    py0 = py0_ref[0, 0, :][:, None]
    wx1 = wx1_ref[0, 0, :][:, None]
    wy1 = wy1_ref[0, 0, :][:, None]
    wx = (1.0 - wx1) * (x_slot == rx0) + wx1 * (x_slot == rx0 + 1)
    wy = (1.0 - wy1) * (y_slot == py0) + wy1 * (y_slot == py0 + 1)
    out_ref[0, 0] = (g * wx * wy).astype(out_ref.dtype)


def pallas_fused(xf, idx, rx0, py0, wx1, wy1):
    """Gather + bilinear select fused; emits the lane-wise product
    (pix, 80); the final (2,2gp)-slot fold happens outside (cheap)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pix_spec = lambda: pl.BlockSpec(  # noqa: E731
        (1, 1, N_IDX), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM
    )
    s = pl.pallas_call(
        _fused_kernel,
        grid=(N_IMG, TAPS),
        in_specs=[
            pix_spec(), pix_spec(), pix_spec(), pix_spec(), pix_spec(),
            pl.BlockSpec((1, ROWS, ROW_W), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, N_IDX, ROW_W), lambda i, t: (i, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (N_IMG, TAPS, N_IDX, ROW_W), jnp.bfloat16
        ),
    )(idx, rx0, py0, wx1, wy1, xf)
    return s.reshape(N_IMG, TAPS, N_IDX, 2 * 2 * GP, CG).sum(
        axis=-2, dtype=jnp.float32
    ).astype(jnp.bfloat16)


pallas_fused_jit = jax.jit(pallas_fused)
pallas_take_jit = jax.jit(pallas_take)


def timed(fn, *args, iters=5):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    enable_compilation_cache()
    xf, idx, rx0, py0, wx1, wy1 = make_inputs()

    ref_g = None
    # gather-only comparison
    for name, fn, args in [
        ("xla_take", xla_take, (xf, idx)),
        ("pallas_take", pallas_take_jit, (xf, idx)),
    ]:
        try:
            out = np.asarray(fn(*args), np.float32)
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:300]}")
            continue
        if ref_g is None:
            ref_g = out
            err = 0.0
        else:
            err = float(np.max(np.abs(out - ref_g)))
        dt = timed(fn, *args)
        gbps = out.nbytes / dt / 1e9
        print(f"{name:14s} {dt*1e3:8.2f} ms  {gbps:6.1f} GB/s gathered"
              f"   max diff {err:.1e}", flush=True)

    # fused comparison
    ref_f = None
    for name, fn in [("xla_fused", xla_take_fused), ("pallas_fused", pallas_fused_jit)]:
        try:
            out = np.asarray(
                fn(xf, idx, rx0, py0, wx1, wy1), np.float32
            )
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:300]}")
            continue
        if ref_f is None:
            ref_f = out
            err = 0.0
        else:
            err = float(np.max(np.abs(out - ref_f)))
        dt = timed(fn, xf, idx, rx0, py0, wx1, wy1)
        print(f"{name:14s} {dt*1e3:8.2f} ms   max diff {err:.1e}", flush=True)


if __name__ == "__main__":
    main()
