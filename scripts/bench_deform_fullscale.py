"""Microbench modulated_deform_conv2d at the full-VRT tile shape.

The tile trace (docs/tpu_kernel_notes.md, round 3) attributes ~0.8 s of
the 3.59 s 16x128x128 tile to the deform packed-window gathers
(bf16[2949120,120] rows at ~43 GB/s effective) plus ~0.9 s of
reshape/copy layout churn moving the gathered windows from the
(n*G, ho, wo) row order back to (n, ho, wo, G*cg) for the tap matmuls.

Variants measured here at the exact alignment shape (n=15 frame pairs,
128x128, cin=120, G=12, cg=10, 9 taps, bf16):

  current      ops.deform.deform_conv2d as shipped
  groups_last  bespoke packed gather whose OUTPUT rows are ordered
               (n, ho, wo, G) so the einsum result reshapes straight to
               (n, ho, wo, cin) with no transpose (channel order is
               already group-major) — kills the per-tap 59 MB
               transposes and the offset/mask transposes
  gp6          groups_last with doubled row width (480 B rows)

Run: python scripts/bench_deform_fullscale.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from vsrlab_tpu.ops.deform import deform_conv2d  # noqa: E402
from vsrlab_tpu.utils import enable_compilation_cache  # noqa: E402


def deform_groups_last(x, offset, weight, bias, mask, gp=3, padding=1):
    """Deform conv with (n, ho, wo, G)-ordered gather rows.

    Same math as ops.deform.deform_conv2d (stride=1, dilation=1), but
    the bilinear packed-window gather emits rows in (n, ho, wo, G)
    order: the einsum output (n, ho, wo, G, cg) reshapes for free to
    (n, ho, wo, cin) because the model's channel order is group-major.
    """
    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    taps = kh * kw
    groups = offset.shape[-1] // (2 * taps)
    cg = cin // groups
    ho, wo = offset.shape[1], offset.shape[2]
    cdt = jnp.float32

    off = offset.reshape(n, ho, wo, groups, taps, 2).astype(cdt)
    m = mask.reshape(n, ho, wo, groups, taps).astype(cdt)

    ys = jnp.arange(ho, dtype=cdt).reshape(1, ho, 1, 1) - padding
    xs = jnp.arange(wo, dtype=cdt).reshape(1, 1, wo, 1) - padding

    # packed 2x(2*gp) window table, one table per (n, g) image
    wp = -(-w // gp) * gp
    wg = wp // gp
    xg = x.reshape(n, h, w, groups, cg).transpose(0, 3, 1, 2, 4)
    xg = xg.reshape(n * groups, h, w, cg)
    xpad = xg if wp == w else jnp.pad(xg, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
    xp = xpad.reshape(n * groups, h, wg, gp * cg)
    xp2 = jnp.concatenate([xp[:, :, :-1], xp[:, :, 1:]], axis=-1)
    xp4 = jnp.concatenate([xp2[:, :-1], xp2[:, 1:]], axis=-1)
    xf = xp4.reshape(n * groups * (h - 1) * (wg - 1), 4 * gp * cg)

    rows_per_img = (h - 1) * (wg - 1)
    base = (jnp.arange(n * groups, dtype=jnp.int32) * rows_per_img).reshape(
        n, 1, 1, groups
    )

    w_k = weight.astype(x.dtype).reshape(taps, cin, cout)
    out = None
    for k in range(taps):
        ky, kx = divmod(k, kw)
        iy = ys + ky + off[..., k, 0]  # (n, ho, wo, G)
        ix = xs + kx + off[..., k, 1]

        x0f = jnp.floor(ix)
        y0f = jnp.floor(iy)
        wx1 = ix - x0f
        wy1 = iy - y0f
        wx0 = 1.0 - wx1
        wy0 = 1.0 - wy1
        # zeros padding-mode validity
        wx0 = jnp.where((x0f >= 0) & (x0f <= w - 1), wx0, 0.0)
        wx1 = jnp.where((x0f + 1 >= 0) & (x0f + 1 <= w - 1), wx1, 0.0)
        wy0 = jnp.where((y0f >= 0) & (y0f <= h - 1), wy0, 0.0)
        wy1 = jnp.where((y0f + 1 >= 0) & (y0f + 1 <= h - 1), wy1, 0.0)

        x0c = jnp.clip(x0f, -1.0, w).astype(jnp.int32)
        y0c = jnp.clip(y0f, -1.0, h).astype(jnp.int32)
        x0i = jnp.clip(x0c, 0, w - 2)
        y0i = jnp.clip(y0c, 0, h - 2)
        g0 = jnp.minimum(x0i // gp, wg - 2)
        rx0 = x0c - g0 * gp
        py0 = y0c - y0i

        lin = (base + y0i * (wg - 1) + g0).reshape(-1)
        g = jnp.take(xf, lin, axis=0).reshape(ix.shape + (2, 2 * gp, cg))
        if g.dtype != cdt:
            g = jax.lax.optimization_barrier(g)
            g = g.astype(cdt)

        kk = jnp.arange(2 * gp, dtype=jnp.int32)
        selx = wx0[..., None] * (kk == rx0[..., None]).astype(cdt) + wx1[
            ..., None
        ] * (kk == (rx0 + 1)[..., None]).astype(cdt)
        kyv = jnp.arange(2, dtype=jnp.int32)
        sely = wy0[..., None] * (kyv == py0[..., None]).astype(cdt) + wy1[
            ..., None
        ] * (kyv == (py0 + 1)[..., None]).astype(cdt)
        w2 = sely[..., :, None] * selx[..., None, :]
        s = jnp.einsum("...yk,...ykc->...c", w2, g)  # (n, ho, wo, G, cg)
        s = (s * m[..., k, None]).astype(x.dtype)
        contrib = jnp.matmul(
            s.reshape(n, ho, wo, cin), w_k[k], preferred_element_type=cdt
        )
        out = contrib if out is None else out + contrib
    return (out + bias.astype(cdt)).astype(x.dtype)


def deform_gdot(x, offset, weight, bias, mask, padding=1):
    """Deform conv keeping the gather's fast (n*G, ho, wo) row order and
    NEVER transposing the sampled data: per tap, a G-batched dot with
    K=cg contracts each group's channels against its weight slice, taps
    accumulate in the G-major space, and one final reduce over G
    produces (n, ho, wo, cout). Trades the 9 per-tap 59 MB transposes
    for MXU K-padding (K=10 -> 128) plus one cheap reduction.
    """
    from vsrlab_tpu.ops.warp import sample_pixel_coords

    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    taps = kh * kw
    groups = offset.shape[-1] // (2 * taps)
    cg = cin // groups
    ho, wo = offset.shape[1], offset.shape[2]
    cdt = jnp.float32

    off = offset.reshape(n, ho, wo, groups, taps, 2).astype(cdt)
    m = mask.reshape(n, ho, wo, groups, taps).astype(cdt)
    off_b = off.transpose(0, 3, 1, 2, 4, 5).reshape(n * groups, ho, wo, taps, 2)
    m_b = m.transpose(0, 3, 1, 2, 4).reshape(n * groups, ho, wo, taps)

    ys = jnp.arange(ho, dtype=cdt)[:, None] - padding
    xs = jnp.arange(wo, dtype=cdt)[None, :] - padding
    xg = (
        x.reshape(n, h, w, groups, cg)
        .transpose(0, 3, 1, 2, 4)
        .reshape(n * groups, h, w, cg)
    )

    # (n*G, cg, cout): group g's weight slice, shared across n
    w_k = weight.astype(x.dtype).reshape(taps, groups, cg, cout)
    acc = None
    for k in range(taps):
        ky, kx = divmod(k, kw)
        py = (ys + ky)[None] + off_b[..., k, 0]
        px = (xs + kx)[None] + off_b[..., k, 1]
        s = sample_pixel_coords(xg, px, py, mode="bilinear", padding_mode="zeros")
        s = s * m_b[..., k][..., None].astype(x.dtype)  # (n*G, ho, wo, cg)
        rhs = jnp.broadcast_to(
            w_k[k][None], (n, groups, cg, cout)
        ).reshape(n * groups, cg, cout)
        contrib = jax.lax.dot_general(
            s.reshape(n * groups, ho * wo, cg),
            rhs,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=cdt,
        )  # (n*G, ho*wo, cout)
        acc = contrib if acc is None else acc + contrib
    out = acc.reshape(n, groups, ho, wo, cout).sum(axis=1)
    return (out + bias.astype(cdt)).astype(x.dtype)


def deform_tapbatch(x, offset, weight, bias, mask, padding=1):
    """Deform conv with all 9 taps' coordinates batched into ONE packed
    take (sample_pixel_coords handles arbitrary trailing index dims);
    the rest matches the shipped op (transpose + per-tap matmul)."""
    from vsrlab_tpu.ops.warp import sample_pixel_coords

    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    taps = kh * kw
    groups = offset.shape[-1] // (2 * taps)
    cg = cin // groups
    ho, wo = offset.shape[1], offset.shape[2]
    cdt = jnp.float32

    off = offset.reshape(n, ho, wo, groups, taps, 2).astype(cdt)
    m = mask.reshape(n, ho, wo, groups, taps).astype(cdt)
    off_b = off.transpose(0, 3, 4, 1, 2, 5).reshape(n * groups, taps, ho, wo, 2)
    m_b = m.transpose(0, 3, 4, 1, 2).reshape(n * groups, taps, ho, wo)

    ys = jnp.arange(ho, dtype=cdt)[:, None] - padding
    xs = jnp.arange(wo, dtype=cdt)[None, :] - padding
    ky = (jnp.arange(taps) // kw).astype(cdt)[:, None, None]
    kx = (jnp.arange(taps) % kw).astype(cdt)[:, None, None]
    py = (ys[None] + ky)[None] + off_b[..., 0]  # (n*G, taps, ho, wo)
    px = (xs[None] + kx)[None] + off_b[..., 1]

    xg = (
        x.reshape(n, h, w, groups, cg)
        .transpose(0, 3, 1, 2, 4)
        .reshape(n * groups, h, w, cg)
    )
    s_all = sample_pixel_coords(xg, px, py, mode="bilinear", padding_mode="zeros")
    s_all = s_all * m_b[..., None].astype(x.dtype)  # (n*G, taps, ho, wo, cg)

    w_k = weight.astype(x.dtype).reshape(taps, cin, cout)
    out = None
    for k in range(taps):
        s = s_all[:, k].reshape(n, groups, ho, wo, cg).transpose(0, 2, 3, 1, 4)
        contrib = jnp.matmul(
            s.reshape(n, ho, wo, cin), w_k[k], preferred_element_type=cdt
        )
        out = contrib if out is None else out + contrib
    return (out + bias.astype(cdt)).astype(x.dtype)


def timed(fn, *args, iters=5):
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
    n, hw, cin, groups = 15, 128, 120, 12
    taps = 9
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((n, hw, hw, cin)), dt)
    # offsets in the trained regime: flow prior (few px) + bounded residue
    offset = jnp.asarray(
        rng.standard_normal((n, hw, hw, 2 * groups * taps)) * 3.0, dt
    )
    mask = jnp.asarray(rng.random((n, hw, hw, groups * taps)), dt)
    weight = jnp.asarray(rng.standard_normal((3, 3, cin, cin)) * 0.03, jnp.float32)
    bias = jnp.zeros((cin,), jnp.float32)

    variants = {
        "current": jax.jit(
            lambda *a: deform_conv2d(a[0], a[1], a[2], a[3], 1, 1, 1, a[4])
        ),
    }
    if "--gp2" in sys.argv:
        # same op with 2-position packed rows (160 B vs 240 B): separates
        # row-latency-bound from bandwidth-bound gather behavior
        import vsrlab_tpu.ops.warp as warp_mod

        orig = warp_mod._window_group

        def jit_with_gp(gp):
            def fn(*a):
                warp_mod._window_group = lambda c, n_idx=0, itemsize=4: gp
                try:
                    return deform_conv2d(a[0], a[1], a[2], a[3], 1, 1, 1, a[4])
                finally:
                    warp_mod._window_group = orig

            return jax.jit(fn)

        variants["gp2"] = jit_with_gp(2)
        variants["gp4"] = jit_with_gp(4)
    if "--more" in sys.argv:
        variants["gdot"] = jax.jit(deform_gdot)
        variants["tapbatch"] = jax.jit(deform_tapbatch)
    if "--groups-last" in sys.argv:
        variants["groups_last"] = jax.jit(lambda *a: deform_groups_last(*a, gp=3))
        variants["gp6"] = jax.jit(lambda *a: deform_groups_last(*a, gp=6))

    args = (x, offset, weight, bias, mask)
    r_cur = np.asarray(variants["current"](*args), np.float32)
    ref_mag = np.max(np.abs(r_cur)) + 1e-8
    for name, fn in variants.items():
        r = np.asarray(fn(*args), np.float32)
        err = np.max(np.abs(r_cur - r)) / ref_mag
        dt_s = timed(fn, *args)
        print(f"{name:12s} {dt_s*1e3:8.1f} ms   rel max diff {err:.1e}", flush=True)


if __name__ == "__main__":
    main()
