"""Pooling primitives (channels-last).

``avg_pool2d`` replaces ``torch.nn.functional.avg_pool2d`` as used by the
SpyNet image pyramids (reference src/vsr/models/RealBasicVSR/modules/spynet.py:44-45,
src/vsr/models/VRT/modules/spynet.py:112-113) and the RAFT correlation pyramid
(src/optical_flow/models/raft/corr.py:21).
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp


def avg_pool2d(x: jnp.ndarray, kernel_size: int = 2, stride: int | None = None) -> jnp.ndarray:
    """Average pooling on ``(..., H, W, C)``.

    No padding (the reference never pads its pools), so torch's
    ``count_include_pad`` distinction is moot; trailing rows/cols that don't
    fill a window are dropped, matching torch.
    """
    k = kernel_size
    s = stride or k
    nd = x.ndim
    window = (1,) * (nd - 3) + (k, k, 1)
    strides = (1,) * (nd - 3) + (s, s, 1)
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    summed = lax.reduce_window(
        x.astype(compute_dtype), 0.0, lax.add, window, strides, "VALID"
    )
    return (summed / (k * k)).astype(x.dtype)
