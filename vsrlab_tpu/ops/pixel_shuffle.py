"""PixelShuffle as pure reshape/transpose (XLA lowers this to a layout op).

Replaces ``torch.nn.PixelShuffle`` (reference src/core/modules/upsampling.py:4-23,
src/vsr/models/VRT/vrt.py:34). Torch semantics: channels are interpreted as
``(C_out, r, r)`` blocks, i.e. ``out[.., h*r+i, w*r+j, c] = in[.., h, w, c*r*r + i*r + j]``.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, upscale_factor: int) -> jnp.ndarray:
    """``(..., H, W, C*r^2) -> (..., H*r, W*r, C)`` with torch channel order."""
    r = upscale_factor
    *lead, h, w, c = x.shape
    assert c % (r * r) == 0, f"channels {c} not divisible by r^2={r * r}"
    c_out = c // (r * r)
    # torch layout is (C_out, r_h, r_w) along the channel axis
    x = x.reshape(*lead, h, w, c_out, r, r)
    # (..., h, w, c, rh, rw) -> (..., h, rh, w, rw, c)
    nd = x.ndim
    perm = tuple(range(nd - 5)) + (nd - 5, nd - 2, nd - 4, nd - 1, nd - 3)
    x = x.transpose(perm)
    return x.reshape(*lead, h * r, w * r, c_out)


def pixel_unshuffle(x: jnp.ndarray, downscale_factor: int) -> jnp.ndarray:
    """Inverse of :func:`pixel_shuffle`: ``(..., H*r, W*r, C) -> (..., H, W, C*r^2)``."""
    r = downscale_factor
    *lead, hr, wr, c = x.shape
    assert hr % r == 0 and wr % r == 0
    h, w = hr // r, wr // r
    x = x.reshape(*lead, h, r, w, r, c)
    nd = x.ndim
    # (..., h, rh, w, rw, c) -> (..., h, w, c, rh, rw)
    perm = tuple(range(nd - 5)) + (nd - 5, nd - 3, nd - 1, nd - 4, nd - 2)
    x = x.transpose(perm)
    return x.reshape(*lead, h, w, c * r * r)
