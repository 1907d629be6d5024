"""Grid sampling and optical-flow warping (torch-exact, channels-last).

This is the single hottest primitive in the framework (SURVEY.md §2.9): every
flow-based alignment in BasicVSR / SpyNet / VRT / RAFT / IRR-PWC sits on it.
It replaces ``torch.nn.functional.grid_sample`` (reference call sites:
src/vsr/models/RealBasicVSR/modules/spynet.py:95-106,
src/vsr/models/VRT/modules/spynet.py:11-63, src/optical_flow/models/raft/utils.py:4-12).

Implementation (round 3, measured — scripts/bench_warp_variants.py): the
bilinear path packs the whole 2×2 interpolation window into ONE flattened
``jnp.take`` of wide rows. The image is pre-shifted into a
``(H-1, W/gp-1, 2·2·gp·C)`` tensor whose row (y, g) holds rows y,y+1 ×
x-groups g,g+1; each output pixel issues ONE gather index and selects its
4 corners from the row by a one-hot×weight contraction on the VPU. On
v5e this measures 1.9× faster forward and 4.7× faster VJP than the
previous 4-corner ``take_along_axis`` formulation (18.0 vs 34.4 ms fwd,
39 vs 183 ms grad at 18×192×320×3): XLA charges gathers per *index*
(~7 ns/row), so one take of 96-float rows beats four takes of 12-byte
rows, and the scatter-add transpose collapses 4 colliding scatters into
one plus dense adds through the shift/concat transpose.

Why not a Pallas kernel (re-tested round 4 at the packed-row layout —
scripts/bench_pallas_deform_gather.py): Mosaic's ``tpu.dynamic_gather``
is a same-shape vreg PERMUTATION ("Shape mismatch in input, indices and
output" for any table→larger-output take, verified on v5e), per-row
dynamic slices on the tiled sublane dim are rejected ("cannot statically
prove that index in dimension 1 is a multiple of 8"), and the one
formulation that DOES lower — 8-row block loads at an untiled major
index + one-hot sublane select — measures 63.4 vs 68.6 ms/tap against
this file's flattened take at the full-VRT 15-pair shape (1.08×), while
the shipped per-pair chunked path already runs ~3× that row rate via
locality. Closed by measurement; revisit only if Mosaic grows
cross-vreg gathers.

Conventions (channels-last):
  * images ``(N, H, W, C)``
  * sampling grids ``(N, Ho, Wo, 2)`` with normalized ``(x, y)`` in [-1, 1]
  * flows ``(N, H, W, 2)`` with pixel displacements ``(dx, dy)``
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord, size: int, align_corners: bool):
    """[-1, 1] -> pixel coordinates, torch convention."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _reflect(coord, low: float, high: float):
    """Reflect coordinates into [low, high] (torch grid_sampler reflection)."""
    span = high - low
    safe = jnp.where(span > 0, span, 1.0)
    coord = jnp.abs(coord - low) % (2.0 * safe)
    coord = jnp.where(coord > safe, 2.0 * safe - coord, coord) + low
    return jnp.where(span > 0, coord, low)


def _pad_coords(ix, iy, h: int, w: int, padding_mode: str, align_corners: bool):
    """Apply the padding mode to continuous sample coordinates."""
    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, w - 1)
        iy = jnp.clip(iy, 0.0, h - 1)
    elif padding_mode == "reflection":
        if align_corners:
            ix = _reflect(ix, 0.0, float(w - 1))
            iy = _reflect(iy, 0.0, float(h - 1))
        else:
            ix = _reflect(ix, -0.5, w - 0.5)
            iy = _reflect(iy, -0.5, h - 0.5)
        # torch clips reflected coords to the border as a final step
        ix = jnp.clip(ix, 0.0, w - 1)
        iy = jnp.clip(iy, 0.0, h - 1)
    elif padding_mode != "zeros":
        raise ValueError(f"unknown padding_mode: {padding_mode}")
    return ix, iy


# Packed-window gather (measured 1.9x fwd / 4.7x VJP vs the 4-corner
# take_along_axis path — module docstring). Disable to fall back to the
# reference 4-corner formulation (kept for tests/benchmarks).
USE_PACKED_GATHER = True


def _window_group(c: int, n_idx: int = 0, itemsize: int = 4) -> int:
    """x-positions packed per gather row: target ~64-128 float lanes
    (4·gp·C elements per row; gp=8 measured best at C=3, larger rows
    regress — scripts/bench_warp_variants.py). The gathered-window
    tensor is ``n_idx × 4·gp·C`` elements — at full-VRT deform scale
    that reaches GBs, so gp shrinks until it fits a 1 GB budget."""
    gp = max(1, min(8, 32 // max(c, 1)))
    budget = 1 << 30
    while gp > 1 and n_idx * 4 * gp * c * itemsize > budget:
        gp //= 2
    return gp


def _bilinear_packed(x, ix, iy, padding_mode: str, window_group: int | None = None):
    """Bilinear sampling via ONE flattened take of 2×2-window rows.

    ``ix``/``iy`` are continuous pixel coords already processed by
    ``_pad_coords`` (border/reflection: clipped into range; zeros:
    unclipped — handled by factored per-axis validity masks, exactly
    equivalent to per-corner masks because the valid region is a box).
    Returns the sampled array in the compute dtype, or None when the
    shape can't host a 2-row/2-group window (caller falls back).
    """
    n, h, w, c = x.shape
    gp = window_group or _window_group(c, ix.size, x.dtype.itemsize)
    wp = -(-w // gp) * gp
    wg = wp // gp
    if h < 2 or wg < 2:
        return None
    dt = ix.dtype

    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    wx1 = ix - x0f
    wy1 = iy - y0f
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    if padding_mode == "zeros":
        wx0 = jnp.where((x0f >= 0) & (x0f <= w - 1), wx0, 0.0)
        wx1 = jnp.where((x0f + 1 >= 0) & (x0f + 1 <= w - 1), wx1, 0.0)
        wy0 = jnp.where((y0f >= 0) & (y0f <= h - 1), wy0, 0.0)
        wy1 = jnp.where((y0f + 1 >= 0) & (y0f + 1 <= h - 1), wy1, 0.0)

    # int window coordinates; the float clip bounds the int cast (zeros
    # mode can produce arbitrarily large coords). Corners that fall
    # outside their window's one-hot range carry exactly-zero weight, so
    # their dropped/garbage positions contribute nothing.
    x0c = jnp.clip(x0f, -1.0, w).astype(jnp.int32)
    y0c = jnp.clip(y0f, -1.0, h).astype(jnp.int32)
    x0i = jnp.clip(x0c, 0, w - 2)
    y0i = jnp.clip(y0c, 0, h - 2)
    g0 = jnp.minimum(x0i // gp, wg - 2)
    rx0 = x0c - g0 * gp
    py0 = y0c - y0i

    # pack and gather in the INPUT dtype (bf16 halves both the packed
    # copies and the gathered-window tensor — at full-VRT deform scale
    # these are multi-GB); the upcast to the fp32 compute dtype happens
    # on the gathered windows, which is numerically identical
    xpad = x if wp == w else jnp.pad(x, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
    xp = xpad.reshape(n, h, wg, gp * c)
    xp2 = jnp.concatenate([xp[:, :, :-1], xp[:, :, 1:]], axis=-1)
    xp4 = jnp.concatenate([xp2[:, :-1], xp2[:, 1:]], axis=-1)
    xf = xp4.reshape(n * (h - 1) * (wg - 1), 4 * gp * c)

    lead = (n,) + (1,) * (ix.ndim - 1)
    base = (jnp.arange(n, dtype=jnp.int32) * ((h - 1) * (wg - 1))).reshape(lead)
    lin = (base + y0i * (wg - 1) + g0).reshape(-1)
    g = jnp.take(xf, lin, axis=0).reshape(ix.shape + (2, 2 * gp, c))
    if g.dtype != dt:
        # keep the gather's OUTPUT in the input dtype: without the barrier
        # XLA fuses the upcast into the gather and materialises the window
        # tensor in fp32 (5.27 GB at full-VRT deform scale); behind it the
        # convert fuses into the contraction instead
        g = jax.lax.optimization_barrier(g)
        g = g.astype(dt)

    k = jnp.arange(2 * gp, dtype=jnp.int32)
    selx = wx0[..., None] * (k == rx0[..., None]).astype(dt) + wx1[
        ..., None
    ] * (k == (rx0 + 1)[..., None]).astype(dt)
    ky = jnp.arange(2, dtype=jnp.int32)
    sely = wy0[..., None] * (ky == py0[..., None]).astype(dt) + wy1[
        ..., None
    ] * (ky == (py0 + 1)[..., None]).astype(dt)
    w2 = sely[..., :, None] * selx[..., None, :]
    return jnp.einsum("...yk,...ykc->...c", w2, g)


def _nearest4_packed(x, ix, iy, padding_mode: str):
    """All four nearest taps (floor/ceil × x/y) from ONE packed-window
    take (VRT ``nearest4`` aligned-image warping — reference
    VRT/modules/spynet.py:39-54). Channel order matches the tap order
    (floor,floor), (floor,ceil), (ceil,floor), (ceil,ceil) of (x, y).
    Returns None when the shape can't host the window."""
    n, h, w, c = x.shape
    gp = _window_group(c, ix.size, x.dtype.itemsize)
    wp = -(-w // gp) * gp
    wg = wp // gp
    if h < 2 or wg < 2:
        return None
    dt = ix.dtype

    xf0 = jnp.floor(ix)
    yf0 = jnp.floor(iy)
    # torch ceil: equals floor at exact integers (NOT floor+1)
    xc0 = jnp.ceil(ix)
    yc0 = jnp.ceil(iy)

    def valid(v, size):
        if padding_mode != "zeros":
            return jnp.ones_like(v, dtype=jnp.bool_)
        return (v >= 0) & (v <= size - 1)

    vxf, vxc = valid(xf0, w), valid(xc0, w)
    vyf, vyc = valid(yf0, h), valid(yc0, h)

    x0c = jnp.clip(xf0, -1.0, w).astype(jnp.int32)
    y0c = jnp.clip(yf0, -1.0, h).astype(jnp.int32)
    x0i = jnp.clip(x0c, 0, w - 2)
    y0i = jnp.clip(y0c, 0, h - 2)
    g0 = jnp.minimum(x0i // gp, wg - 2)
    rxf = x0c - g0 * gp
    rxc = jnp.clip(xc0, -1.0, w).astype(jnp.int32) - g0 * gp
    pyf = y0c - y0i
    pyc = jnp.clip(yc0, -1.0, h).astype(jnp.int32) - y0i

    xpad = x if wp == w else jnp.pad(x, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
    xp = xpad.reshape(n, h, wg, gp * c)  # input dtype: half the bytes at bf16
    xp2 = jnp.concatenate([xp[:, :, :-1], xp[:, :, 1:]], axis=-1)
    xp4 = jnp.concatenate([xp2[:, :-1], xp2[:, 1:]], axis=-1)
    xflat = xp4.reshape(n * (h - 1) * (wg - 1), 4 * gp * c)

    lead = (n,) + (1,) * (ix.ndim - 1)
    base = (jnp.arange(n, dtype=jnp.int32) * ((h - 1) * (wg - 1))).reshape(lead)
    lin = (base + y0i * (wg - 1) + g0).reshape(-1)
    g = jnp.take(xflat, lin, axis=0).reshape(ix.shape + (2, 2 * gp, c))
    if g.dtype != dt:
        g = jax.lax.optimization_barrier(g)  # see _bilinear_packed

    k = jnp.arange(2 * gp, dtype=jnp.int32)
    ky = jnp.arange(2, dtype=jnp.int32)
    selxf = (vxf[..., None] & (k == rxf[..., None])).astype(dt)
    selxc = (vxc[..., None] & (k == rxc[..., None])).astype(dt)
    selyf = (vyf[..., None] & (ky == pyf[..., None])).astype(dt)
    selyc = (vyc[..., None] & (ky == pyc[..., None])).astype(dt)

    outs = []
    for sx, sy in ((selxf, selyf), (selxf, selyc), (selxc, selyf), (selxc, selyc)):
        w2 = sy[..., :, None] * sx[..., None, :]
        outs.append(jnp.einsum("...yk,...ykc->...c", w2, g))
    return jnp.concatenate(outs, axis=-1)


def _gather_2d(x_flat, idx_y, idx_x, h: int, w: int):
    """Gather pixels at integer (y, x) from (N, H*W, C) -> (N, Ho, Wo, C)."""
    n = x_flat.shape[0]
    c = x_flat.shape[-1]
    lin = (idx_y * w + idx_x).reshape(n, -1)  # (N, Ho*Wo)
    out = jnp.take_along_axis(x_flat, lin[..., None], axis=1)
    return out.reshape(idx_y.shape + (c,))


def sample_pixel_coords(
    x: jnp.ndarray,
    ix: jnp.ndarray,
    iy: jnp.ndarray,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
    window_group: int | None = None,
) -> jnp.ndarray:
    """Sample ``x`` at continuous PIXEL coordinates (no [-1,1] roundtrip).

    This is the precision-critical core: :func:`flow_warp` calls it with
    ``grid + flow`` directly, so integer-pixel flows sample exactly (the
    torch reference normalises to [-1,1] and back, which costs 1 ULP on
    TPU and breaks bitwise-stable warping).

    Args:
      x: ``(N, H, W, C)``.
      ix, iy: ``(N, Ho, Wo)`` pixel coordinates.
      window_group: override the packed-gather x-positions-per-row
        heuristic (callers with a measured optimum, e.g. the deform
        conv's per-group gathers — scripts/bench_deform_fullscale.py).
    """
    n, h, w, c = x.shape
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    ix = ix.astype(compute_dtype)
    iy = iy.astype(compute_dtype)
    ix, iy = _pad_coords(ix, iy, h, w, padding_mode, align_corners)

    x_flat = x.reshape(n, h * w, c).astype(compute_dtype)

    def corner(idx_y, idx_x, weight):
        """Gather one corner with zeros-mode validity masking."""
        if padding_mode == "zeros":
            valid = (
                (idx_x >= 0) & (idx_x <= w - 1) & (idx_y >= 0) & (idx_y <= h - 1)
            )
            weight = jnp.where(valid, weight, 0.0)
        iy_c = jnp.clip(idx_y, 0, h - 1).astype(jnp.int32)
        ix_c = jnp.clip(idx_x, 0, w - 1).astype(jnp.int32)
        vals = _gather_2d(x_flat, iy_c, ix_c, h, w)
        return vals * weight[..., None]

    if mode == "bilinear":
        out = (
            _bilinear_packed(x, ix, iy, padding_mode, window_group)
            if USE_PACKED_GATHER
            else None
        )
        if out is None:
            x0 = jnp.floor(ix)
            y0 = jnp.floor(iy)
            x1 = x0 + 1.0
            y1 = y0 + 1.0
            wx1 = ix - x0
            wy1 = iy - y0
            wx0 = 1.0 - wx1
            wy0 = 1.0 - wy1
            out = (
                corner(y0, x0, wy0 * wx0)
                + corner(y0, x1, wy0 * wx1)
                + corner(y1, x0, wy1 * wx0)
                + corner(y1, x1, wy1 * wx1)
            )
    elif mode == "nearest":
        # torch rounds with nearbyint (round-half-to-even), like jnp.round
        xr = jnp.round(ix)
        yr = jnp.round(iy)
        out = corner(yr, xr, jnp.ones_like(ix))
    else:
        raise ValueError(f"unknown mode: {mode}")
    return out.astype(x.dtype)


def grid_sample(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Torch-exact ``grid_sample`` on channels-last images.

    Args:
      x: ``(N, H, W, C)`` input.
      grid: ``(N, Ho, Wo, 2)`` normalized ``(x, y)`` coordinates in [-1, 1].
      mode: ``bilinear`` | ``nearest``.
      padding_mode: ``zeros`` | ``border`` | ``reflection``.
      align_corners: torch corner convention.

    Returns:
      ``(N, Ho, Wo, C)`` sampled output.
    """
    n, h, w, c = x.shape
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    ix = _unnormalize(grid[..., 0].astype(compute_dtype), w, align_corners)
    iy = _unnormalize(grid[..., 1].astype(compute_dtype), h, align_corners)
    return sample_pixel_coords(x, ix, iy, mode, padding_mode, align_corners)


def _base_grid(h: int, w: int, dtype) -> jnp.ndarray:
    """(H, W, 2) integer pixel grid with (x, y) order."""
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return jnp.stack([xs, ys], axis=-1).astype(dtype)


def flow_warp(
    x: jnp.ndarray,
    flow: jnp.ndarray,
    interpolation: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = True,
) -> jnp.ndarray:
    """Warp an image/feature map by an optical flow field.

    Torch-reference semantics (src/vsr/models/RealBasicVSR/modules/spynet.py:95-106
    and src/vsr/models/VRT/modules/spynet.py:11-63): the sample location for
    output pixel ``p`` is ``p + flow[p]``; coordinates are normalized with
    ``align_corners=True`` by default.

    Args:
      x: ``(N, H, W, C)``.
      flow: ``(N, H, W, 2)`` pixel displacements ``(dx, dy)``.
      interpolation: ``bilinear`` | ``nearest`` | ``nearest4``. ``nearest4``
        returns the 4 nearest-neighbour taps stacked on channels
        ``(N, H, W, 4*C)`` in order (floor,floor), (floor,ceil), (ceil,floor),
        (ceil,ceil) of (x, y) — matching reference VRT/modules/spynet.py:39-54.

    Returns:
      ``(N, H, W, C)`` (or ``(N, H, W, 4*C)`` for ``nearest4``).
    """
    n, h, w, c = x.shape
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    grid = _base_grid(h, w, compute_dtype)[None]  # (1, H, W, 2)
    vgrid = grid + flow.astype(compute_dtype)
    vx, vy = vgrid[..., 0], vgrid[..., 1]

    if not align_corners:
        # torch reference normalises with the (size-1) convention then
        # grid_sample unnormalises with align_corners=False — NOT an
        # identity; reproduce the roundtrip for exact parity.
        vx = _unnormalize(2.0 * vx / max(w - 1, 1) - 1.0, w, False)
        vy = _unnormalize(2.0 * vy / max(h - 1, 1) - 1.0, h, False)
    # align_corners=True (the reference default): the normalise/unnormalise
    # pair is an exact identity, so sample at pixel coords directly —
    # bitwise-stable for integer flows (BASELINE.md north-star) and cheaper.

    if interpolation == "nearest4":
        # reflection reflects each tap AFTER floor/ceil — not expressible
        # as a pre-clip, so it keeps the per-tap path
        if USE_PACKED_GATHER and padding_mode in ("zeros", "border"):
            cx, cy = _pad_coords(vx, vy, h, w, padding_mode, align_corners)
            out = _nearest4_packed(
                x, cx.astype(compute_dtype), cy.astype(compute_dtype),
                padding_mode,
            )
            if out is not None:
                return out.astype(x.dtype)
        taps = [
            (jnp.floor(vx), jnp.floor(vy)),
            (jnp.floor(vx), jnp.ceil(vy)),
            (jnp.ceil(vx), jnp.floor(vy)),
            (jnp.ceil(vx), jnp.ceil(vy)),
        ]
        outs = [
            sample_pixel_coords(x, tx, ty, "nearest", padding_mode, align_corners)
            for tx, ty in taps
        ]
        return jnp.concatenate(outs, axis=-1)

    return sample_pixel_coords(x, vx, vy, interpolation, padding_mode, align_corners)
