"""Space-to-depth lowering of stride-1 odd-kernel convolutions.

Why: SpyNet's per-level heads run 7×7 convs at channel widths
8/32/64/32/16/2 — far below the TPU's 128-lane tile, so XLA pads every
operand 2–64× and the head executes at 0.6–22.8 TFLOP/s (measured,
docs/tpu_kernel_notes.md). A stride-1 7×7 conv on ``(N, H, W, C)`` is
EXACTLY a 5×5 conv on the space-to-depth-by-2 tensor ``(N, H/2, W/2, 4C)``
with a derived kernel: 2.04× nominal FLOPs (zero phantom taps) but 4×
the channel width, which more than pays for itself at these widths.

Derivation: for output phase p=(py,px) and tap d=(dy,dx) of the 7×7
kernel, the input pixel ``2i+py+dy-3`` lives at s2d position
``i + (py+dy-3)//2`` in input phase ``(py+dy-3) % 2`` — so each
(s2d-tap, in-phase, out-phase) triple maps to at most one original tap,
and the derived kernel is a single gather of the original weights.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // r, w // r, r * r * c)


def depth_to_space(y: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    n, h2, w2, c4 = y.shape
    c = c4 // (r * r)
    y = y.reshape(n, h2, w2, r, r, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h2 * r, w2 * r, c)


@lru_cache(maxsize=None)
def _s2d_tap_map(k: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static gather map for kernel size ``k`` (odd): returns
    (iy, ix, mask) of shape (ks, ks, 2, 2, 2, 2) indexed
    [qy, qx, ry, rx, py, px] where ks = k//2 + 2."""
    half = k // 2
    qmin = min((py + dy - half) // 2 for py in range(2) for dy in range(k))
    qmax = max((py + dy - half) // 2 for py in range(2) for dy in range(k))
    ks = qmax - qmin + 1
    iy = np.zeros((ks, ks, 2, 2, 2, 2), np.int32)
    ix = np.zeros((ks, ks, 2, 2, 2, 2), np.int32)
    mask = np.zeros((ks, ks, 2, 2, 2, 2), np.float32)
    for py in range(2):
        for px in range(2):
            for dy in range(k):
                for dx in range(k):
                    qy, ry = divmod(py + dy - half, 2)
                    qx, rx = divmod(px + dx - half, 2)
                    iy[qy - qmin, qx - qmin, ry, rx, py, px] = dy
                    ix[qy - qmin, qx - qmin, ry, rx, py, px] = dx
                    mask[qy - qmin, qx - qmin, ry, rx, py, px] = 1.0
    return iy, ix, mask


def s2d_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Derived s2d kernel: (k, k, Ci, Co) -> (ks, ks, 4Ci, 4Co)."""
    # numpy weights (e.g. template-less orbax restores) + traced index
    # arrays (jax.export symbolic traces) would hit numpy fancy-indexing
    w = jnp.asarray(w)
    k = w.shape[0]
    ci, co = w.shape[2], w.shape[3]
    iy, ix, mask = _s2d_tap_map(k)
    ks = iy.shape[0]
    # gather: (ks, ks, ry, rx, py, px, ci, co)
    wg = w[jnp.asarray(iy), jnp.asarray(ix)] * jnp.asarray(mask)[..., None, None]
    # -> (ks, ks, (ry rx ci), (py px co))
    wg = wg.transpose(0, 1, 2, 3, 6, 4, 5, 7)
    return wg.reshape(ks, ks, 4 * ci, 4 * co)


def s2d_bias(b: jnp.ndarray) -> jnp.ndarray:
    """Bias in s2d channel order (phase-major): (Co,) -> (4Co,)."""
    return jnp.tile(b, 4)


def conv_s2d(xs: jnp.ndarray, wp: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 'same' conv in s2d space (pad = (ks-1)//2)."""
    ks = wp.shape[0]
    p = (ks - 1) // 2
    dn = jax.lax.conv_dimension_numbers(
        xs.shape, wp.shape, ("NHWC", "HWIO", "NHWC")
    )
    return jax.lax.conv_general_dilated(
        xs, wp, (1, 1), [(p, p), (p, p)], dimension_numbers=dn
    )
