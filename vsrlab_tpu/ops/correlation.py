"""Correlation / cost-volume primitives for optical-flow networks.

Replaces the reference's pure-PyTorch shift-and-multiply loops
(src/core/modules/correlation.py:7-77, src/optical_flow/models/irr/pwc_modules.py:39-59)
and RAFT's all-pairs matmul (src/optical_flow/models/raft/corr.py:5-42).

TPU notes: the all-pairs correlation is one big batched matmul (MXU). The
windowed cost volumes are expressed as statically-unrolled shifted elementwise
products, which XLA fuses into a single pass over HBM.
"""

from __future__ import annotations

import jax.numpy as jnp


def all_pairs_correlation(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """RAFT all-pairs correlation.

    Args:
      fmap1, fmap2: ``(N, H, W, C)`` feature maps.

    Returns:
      ``(N, H, W, H, W)`` correlation normalized by ``sqrt(C)``
      (reference src/optical_flow/models/raft/corr.py:11-13).
    """
    n, h, w, c = fmap1.shape
    a = fmap1.reshape(n, h * w, c).astype(jnp.float32)
    b = fmap2.reshape(n, h * w, c).astype(jnp.float32)
    corr = jnp.einsum("npc,nqc->npq", a, b, preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.float32(c))
    return corr.reshape(n, h, w, h, w)


def cost_volume(feat1: jnp.ndarray, feat2: jnp.ndarray, max_disp: int) -> jnp.ndarray:
    """PWC-style cost volume: mean-over-channels correlation in a shift window.

    Matches reference src/optical_flow/models/irr/pwc_modules.py:39-59:
    ``feat2`` is zero-padded by ``max_disp`` and shifted over a
    ``(2*max_disp+1)^2`` window; channel order is row-major over (dy, dx).

    Args:
      feat1, feat2: ``(N, H, W, C)``.

    Returns:
      ``(N, H, W, (2*max_disp+1)**2)``.
    """
    n, h, w, c = feat1.shape
    d = max_disp
    f2 = jnp.pad(feat2, ((0, 0), (d, d), (d, d), (0, 0)))
    costs = []
    for i in range(2 * d + 1):
        for j in range(2 * d + 1):
            shifted = f2[:, i : i + h, j : j + w, :]
            costs.append(jnp.mean(feat1 * shifted, axis=-1))
    return jnp.stack(costs, axis=-1)


def spatial_correlation_sample(
    input1: jnp.ndarray,
    input2: jnp.ndarray,
    patch_size: int = 1,
    stride: int = 1,
    padding: int = 0,
    dilation_patch: int = 1,
) -> jnp.ndarray:
    """Patch correlation sampler (kernel_size=1), channels-last.

    Matches reference src/core/modules/correlation.py:7-49 (sum over channels,
    output indexed by patch displacement then spatial position).

    Args:
      input1, input2: ``(N, H, W, C)``.

    Returns:
      ``(N, patch, patch, H', W')`` with ``H' = ceil((H+2p)/stride)``.
    """
    assert patch_size % 2 == 1, "only odd patch sizes supported"
    if padding > 0:
        pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
        input1 = jnp.pad(input1, pad)
        input2 = jnp.pad(input2, pad)
    md = dilation_patch * (patch_size - 1) // 2
    n, h, w, c = input1.shape
    in2 = jnp.pad(input2, ((0, 0), (md, md), (md, md), (0, 0)))
    in1_s = input1[:, ::stride, ::stride, :]
    rows = []
    for i in range(0, 2 * md + 1, dilation_patch):
        row = []
        for j in range(0, 2 * md + 1, dilation_patch):
            p2 = in2[:, i : i + h, j : j + w, :][:, ::stride, ::stride, :]
            row.append(jnp.sum(in1_s * p2, axis=-1))
        rows.append(jnp.stack(row, axis=1))
    return jnp.stack(rows, axis=1)
