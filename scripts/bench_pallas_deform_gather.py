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
  pallas_loop   scalar fori_loop of per-row dynamic-slice copies from
                the VMEM-resident table (idx scalars in SMEM)

MEASURED RULING (this probe, v5e): the vectorized in-kernel take FAILS
to lower — Mosaic's tpu.dynamic_gather requires input, indices and
output shapes to MATCH (it is a within-vreg permutation, not an
arbitrary take), so gathering 16384 rows from an 8001-row table cannot
vectorize regardless of the 80-lane row width; the single-vreg limit in
ops/warp.py:22-27 was about the same constraint from the lane side.

All variants run PER TAP (like the shipped op's tap loop) so in-flight
outputs stay ~0.5 GB; shapes are the exact full-VRT alignment tile
(n=15 pairs, G=12 groups, cg=10, 128x128, gp=2, bf16 —
scripts/bench_deform_fullscale.py).

Run: python scripts/bench_pallas_deform_gather.py  (real TPU)
"""

from __future__ import annotations

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
WG = W // GP  # 64
ROWS = (H - 1) * (WG - 1)  # 8001
ROW_W = 4 * GP * CG  # 80
N_IDX = H * W  # 16384 output pixels per (img, tap)


def make_inputs(seed=0, realistic=True):
    rng = np.random.default_rng(seed)
    xf = jnp.asarray(rng.standard_normal((N_IMG, ROWS, ROW_W)), jnp.bfloat16)
    if realistic:
        # trained-regime locality: sample position = output pixel + flow
        # prior + bounded residue (sigma ~3 px, like
        # bench_deform_fullscale.py) -> neighbouring pixels gather
        # neighbouring table rows. Random indices measure the worst case
        # (7 GB/s); the real model's gathers ran ~43 GB/s (r3 trace).
        py = np.repeat(np.arange(H), W)[None] + rng.standard_normal(
            (N_IMG, N_IDX)) * 3.0
        px = np.tile(np.arange(W), H)[None] + rng.standard_normal(
            (N_IMG, N_IDX)) * 3.0
        y0 = np.clip(np.floor(py), 0, H - 2).astype(np.int64)
        g0 = np.clip(np.floor(px).astype(np.int64) // GP, 0, WG - 2)
        idx = jnp.asarray(y0 * (WG - 1) + g0, jnp.int32)
    else:
        idx = jnp.asarray(
            rng.integers(0, ROWS, size=(N_IMG, N_IDX)), jnp.int32
        )
    # compact per-pixel bilinear metadata (what the fused kernel consumes)
    rx0 = jnp.asarray(rng.integers(0, GP, size=(N_IMG, N_IDX)), jnp.int32)
    py0 = jnp.asarray(rng.integers(0, 2, size=(N_IMG, N_IDX)), jnp.int32)
    wx1 = jnp.asarray(rng.random((N_IMG, N_IDX)), jnp.float32)
    wy1 = jnp.asarray(rng.random((N_IMG, N_IDX)), jnp.float32)
    return xf, idx, rx0, py0, wx1, wy1


# --------------------------------------------------------------------------
# baseline: the shipped XLA formulation (one tap)
# --------------------------------------------------------------------------


@jax.jit
def xla_take(xf, idx):
    """One flattened take, like ops/warp.py _bilinear_packed."""
    base = (jnp.arange(N_IMG, dtype=jnp.int32) * ROWS)[:, None]
    lin = (idx + base).reshape(-1)
    g = jnp.take(xf.reshape(-1, ROW_W), lin, axis=0)
    return g.reshape(N_IMG, N_IDX, ROW_W)


def _select_weights(rx0, py0, wx1, wy1):
    """(img, pix, 2, 2*GP) bilinear one-hot weights."""
    k = jnp.arange(2 * GP, dtype=jnp.int32)
    ky = jnp.arange(2, dtype=jnp.int32)
    selx = (1.0 - wx1)[..., None] * (k == rx0[..., None]) + wx1[..., None] * (
        k == (rx0 + 1)[..., None]
    )
    sely = (1.0 - wy1)[..., None] * (ky == py0[..., None]) + wy1[..., None] * (
        ky == (py0 + 1)[..., None]
    )
    return sely[..., :, None] * selx[..., None, :]


@jax.jit
def xla_fused(xf, idx, rx0, py0, wx1, wy1):
    g = xla_take(xf, idx)  # (img, pix, 80)
    g = jax.lax.optimization_barrier(g).astype(jnp.float32)
    w2 = _select_weights(rx0, py0, wx1, wy1)
    gw = g.reshape(g.shape[:-1] + (2, 2 * GP, CG))
    return jnp.einsum("...yk,...ykc->...c", w2, gw).astype(jnp.bfloat16)


# --------------------------------------------------------------------------
# pallas kernels
# --------------------------------------------------------------------------


def _take_kernel(idx_ref, xf_ref, out_ref):
    # idx block (1, 128, 128): TPU blocks need last-two dims (8, 128)-
    # aligned; the take's 2-D index array returns (128, 128, 80).
    # FAILS to lower on v5e: "Shape mismatch in input, indices and
    # output" — tpu.dynamic_gather is a same-shape vreg permutation.
    out_ref[0] = jnp.take(xf_ref[0], idx_ref[0], axis=0)


def _loop_kernel(idx_ref, xf_ref, out_ref):
    """Per-row dynamic-slice copies; idx scalars live in SMEM."""
    import jax.experimental.pallas as pl

    def body(i, carry):
        j = idx_ref[0, 0, i]
        out_ref[0, pl.ds(i, 1), :] = xf_ref[0, pl.ds(j, 1), :]
        return carry

    jax.lax.fori_loop(0, N_IDX, body, 0)


def pallas_loop(xf, idx):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    idx = idx.reshape(N_IMG, 1, N_IDX)  # block = trailing array dims
    return pl.pallas_call(
        _loop_kernel,
        grid=(N_IMG,),
        in_specs=[
            pl.BlockSpec((1, 1, N_IDX), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ROWS, ROW_W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, N_IDX, ROW_W), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((N_IMG, N_IDX, ROW_W), xf.dtype),
    )(idx, xf)


pallas_loop_jit = jax.jit(pallas_loop)


R8 = -(-ROWS // 8)  # 8-row blocks (sublane granularity)


def _blk_kernel(idx_ref, xf_ref, out_ref):
    """8-row-block loads + one-hot sublane select: the dynamic index
    lands on an UNtiled major dim (legal), the tiled dims stay static.
    Mosaic forbids both vectorized takes (dynamic_gather = same-shape
    vreg permutation) and single-row dynamic slices (multiple-of-8
    proof) — this is the only remaining formulation."""
    import jax.experimental.pallas as pl  # noqa: F401

    sub = jax.lax.broadcasted_iota(jnp.int32, (8, ROW_W), 0)

    def body(ib, c):
        rows = []
        for r in range(8):
            j = idx_ref[0, 0, ib * 8 + r]
            blk = xf_ref[0, j // 8]  # (8, ROW_W), dynamic major index
            sel = (sub == (j % 8)).astype(jnp.float32)
            rows.append(
                jnp.sum(blk.astype(jnp.float32) * sel, axis=0, keepdims=True)
            )
        out_ref[0, ib] = jnp.concatenate(rows, axis=0).astype(out_ref.dtype)
        return c

    jax.lax.fori_loop(0, N_IDX // 8, body, 0)


def pallas_blk(xf, idx):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pad = R8 * 8 - ROWS
    xf4 = jnp.pad(xf, ((0, 0), (0, pad), (0, 0))).reshape(
        N_IMG, R8, 8, ROW_W
    )
    idx = idx.reshape(N_IMG, 1, N_IDX)
    out = pl.pallas_call(
        _blk_kernel,
        grid=(N_IMG,),
        in_specs=[
            pl.BlockSpec((1, 1, N_IDX), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R8, 8, ROW_W), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, N_IDX // 8, 8, ROW_W), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (N_IMG, N_IDX // 8, 8, ROW_W), xf.dtype
        ),
    )(idx, xf4)
    return out.reshape(N_IMG, N_IDX, ROW_W)


pallas_blk_jit = jax.jit(pallas_blk)


PIX_R, PIX_C = 128, 128  # N_IDX as an aligned (rows, cols) block


def pallas_take(xf, idx):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    idx = idx.reshape(N_IMG, PIX_R, PIX_C)
    out = pl.pallas_call(
        _take_kernel,
        grid=(N_IMG,),
        in_specs=[
            pl.BlockSpec((1, PIX_R, PIX_C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, ROW_W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, PIX_R, PIX_C, ROW_W), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (N_IMG, PIX_R, PIX_C, ROW_W), xf.dtype
        ),
    )(idx, xf)
    return out.reshape(N_IMG, N_IDX, ROW_W)


def _fused_kernel(idx_ref, rx0_ref, py0_ref, wx1_ref, wy1_ref, xf_ref, out_ref):
    g = jnp.take(xf_ref[0], idx_ref[0], axis=0).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (PIX_R, PIX_C, ROW_W), 2
    )
    x_slot = (lane // CG) % (2 * GP)
    y_slot = lane // (2 * GP * CG)
    rx0 = rx0_ref[0][..., None]
    py0 = py0_ref[0][..., None]
    wx1 = wx1_ref[0][..., None]
    wy1 = wy1_ref[0][..., None]
    wx = (1.0 - wx1) * (x_slot == rx0) + wx1 * (x_slot == rx0 + 1)
    wy = (1.0 - wy1) * (y_slot == py0) + wy1 * (y_slot == py0 + 1)
    out_ref[0] = (g * wx * wy).astype(out_ref.dtype)


def pallas_fused(xf, idx, rx0, py0, wx1, wy1):
    """Gather + bilinear select fused; emits the lane-wise product
    (pix, 80); the final (2,2gp)-slot fold happens outside (cheap)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pix_spec = lambda: pl.BlockSpec(  # noqa: E731
        (1, PIX_R, PIX_C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    r = lambda a: a.reshape(N_IMG, PIX_R, PIX_C)  # noqa: E731
    s = pl.pallas_call(
        _fused_kernel,
        grid=(N_IMG,),
        in_specs=[
            pix_spec(), pix_spec(), pix_spec(), pix_spec(), pix_spec(),
            pl.BlockSpec((1, ROWS, ROW_W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, PIX_R, PIX_C, ROW_W), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (N_IMG, PIX_R, PIX_C, ROW_W), jnp.bfloat16
        ),
    )(r(idx), r(rx0), r(py0), r(wx1), r(wy1), xf)
    return s.reshape(N_IMG, N_IDX, 2 * 2 * GP, CG).sum(
        axis=-2, dtype=jnp.float32
    ).astype(jnp.bfloat16)


@jax.jit
def xla_fused_ref(xf, idx, rx0, py0, wx1, wy1):
    """Same lane-wise-product semantics as pallas_fused, for equality."""
    g = xla_take(xf, idx).astype(jnp.float32)
    w2 = _select_weights(rx0, py0, wx1, wy1)  # (img, pix, 2, 2GP)
    w80 = jnp.repeat(
        w2.reshape(N_IMG, N_IDX, 2 * 2 * GP), CG, axis=-1
    )
    s = (g * w80).astype(jnp.bfloat16)
    return s.reshape(N_IMG, N_IDX, 2 * 2 * GP, CG).sum(
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
            # sync every call: keeps at most one ~0.5 GB output in flight
            float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    del out
    return best


def main():
    enable_compilation_cache()
    xf, idx, rx0, py0, wx1, wy1 = make_inputs()

    ref_g = None
    for name, fn, args in [
        ("xla_take", xla_take, (xf, idx)),
        ("pallas_take", pallas_take_jit, (xf, idx)),
        ("pallas_loop", pallas_loop_jit, (xf, idx)),
        ("pallas_blk", pallas_blk_jit, (xf, idx)),
    ]:
        try:
            out = fn(*args)
            probe = np.asarray(out[::16, ::64], np.float32)  # small slice
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        err = 0.0 if ref_g is None else float(np.max(np.abs(probe - ref_g)))
        ref_g = probe if ref_g is None else ref_g
        del out
        dt = timed(fn, *args)
        nbytes = N_IMG * N_IDX * ROW_W * 2
        print(f"{name:14s} {dt*1e3:8.2f} ms/tap  "
              f"{nbytes / dt / 1e9:6.1f} GB/s gathered   max diff {err:.1e}",
              flush=True)

    ref_f = None
    for name, fn in [("xla_fused", xla_fused_ref),
                     ("pallas_fused", pallas_fused_jit)]:
        try:
            out = fn(xf, idx, rx0, py0, wx1, wy1)
            probe = np.asarray(out[::16, ::64], np.float32)
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        err = 0.0 if ref_f is None else float(np.max(np.abs(probe - ref_f)))
        ref_f = probe if ref_f is None else ref_f
        del out
        dt = timed(fn, xf, idx, rx0, py0, wx1, wy1)
        print(f"{name:14s} {dt*1e3:8.2f} ms/tap   max diff {err:.1e}",
              flush=True)


if __name__ == "__main__":
    main()
