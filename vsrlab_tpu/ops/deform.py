"""Modulated deformable convolution (DCNv2) as gather + one MXU matmul.

Replaces ``torchvision.ops.deform_conv2d`` (reference call sites:
src/core/modules/conv.py:57, src/vsr/models/VRT/modules/deform_conv.py:144).

TPU-first design: instead of the CUDA per-pixel im2col kernel, we issue one
bilinear ``grid_sample`` per kernel tap (kh*kw of them, each a dense gather
XLA pipelines well), stack the taps on the channel axis, and finish with a
single ``(kh*kw*Cin) x Cout`` matmul that lands on the MXU. The sampling taps
reuse :func:`vsrlab_tpu.ops.warp.grid_sample`, so the whole op is
differentiable and shares the warp oracle's numerics.

Offset layout follows torchvision: ``offset[..., 2*(g*kh*kw + k)]`` is the
**y** displacement and ``... + 1`` the **x** displacement for offset group
``g`` and kernel tap ``k`` (row-major over ``(kh, kw)``). ``mask`` is the
DCNv2 modulation scalar per tap and offset group.
"""

from __future__ import annotations

import jax.numpy as jnp

from vsrlab_tpu.ops.warp import sample_pixel_coords


def deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Deformable conv on channels-last tensors.

    Args:
      x: ``(N, H, W, Cin)``.
      offset: ``(N, Ho, Wo, 2 * G * kh * kw)`` with torchvision (dy, dx) order.
      weight: ``(kh, kw, Cin, Cout)`` (HWIO, flax convention).
      bias: optional ``(Cout,)``.
      mask: optional ``(N, Ho, Wo, G * kh * kw)`` modulation (DCNv2).

    Returns:
      ``(N, Ho, Wo, Cout)``.

    Precision contract: sampling and modulation run in ``x.dtype`` (a
    wider mask is rounded DOWN to it — mask ∈ [0, 1], so bf16 rounding
    is ≤ ~0.4% per tap); only the tap matmul accumulates in fp32. This
    is the measured input-dtype fast path (docs/tpu_kernel_notes.md) —
    pass fp32 features to trade speed for full-precision modulation.
    """
    n, h, w, cin = x.shape
    kh, kw, wc_in, cout = weight.shape
    assert wc_in == cin, "grouped weight (conv groups > 1) not supported"
    taps = kh * kw
    two_g_taps = offset.shape[-1]
    assert two_g_taps % (2 * taps) == 0, "offset channels not a multiple of 2*kh*kw"
    groups = two_g_taps // (2 * taps)
    assert cin % groups == 0, "Cin must be divisible by offset groups"
    cg = cin // groups

    ho, wo = offset.shape[1], offset.shape[2]
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)

    # (N, Ho, Wo, G, taps, 2) with [..., 0]=dy, [..., 1]=dx. Keep the
    # offset/mask fields in their INPUT dtype (a bf16 model's offsets are
    # already bf16-quantised, so the fp32 upcast is exact and can happen
    # on the tiny per-tap slices instead — at full-VRT scale the upfront
    # cast kept a multi-hundred-MB fp32 field alive across all 9 taps).
    off = offset.reshape(n, ho, wo, groups, taps, 2)
    if mask is not None:
        m = mask.reshape(n, ho, wo, groups, taps)

    # Base sampling positions per output pixel and tap (before offsets).
    ys = jnp.arange(ho, dtype=compute_dtype)[:, None] * stride - padding
    xs = jnp.arange(wo, dtype=compute_dtype)[None, :] * stride - padding

    # Fold offset groups into the batch axis so each tap is ONE dense
    # gather of shape (N*G, Ho, Wo, Cg) — no per-group Python loop (VRT
    # uses G=16, which would otherwise emit 9*16 tiny gathers). The
    # operand keeps the INPUT dtype: at full-VRT scale the packed-window
    # gather tensors are multi-GB, and a bf16 model samples/multiplies
    # in bf16 (fp32 inputs are unchanged; coordinates stay fp32 inside
    # the sampler either way).
    xg = (
        x.reshape(n, h, w, groups, cg)
        .transpose(0, 3, 1, 2, 4)
        .reshape(n * groups, h, w, cg)
    )
    off_b = off.transpose(0, 3, 1, 2, 4, 5).reshape(n * groups, ho, wo, taps, 2)
    if mask is not None:
        m_b = m.transpose(0, 3, 1, 2, 4).reshape(n * groups, ho, wo, taps)

    # Per-tap matmul accumulation: concatenating all taps into one
    # (N, Ho, Wo, taps*Cin) im2col buffer costs 2+ GB at full-VRT scale;
    # nine (Cin × Cout) matmuls accumulated in fp32 do the same MXU work
    # (K=Cin is still ≥ the 120-channel tile) with one tap resident at a
    # time.
    w_k = weight.astype(x.dtype).reshape(taps, cin, cout)
    out = None
    for k in range(taps):
        ky, kx = divmod(k, kw)
        # (N*G, Ho, Wo); the per-tap upcast is exact (see above)
        py = (ys + ky * dilation)[None] + off_b[..., k, 0].astype(compute_dtype)
        px = (xs + kx * dilation)[None] + off_b[..., k, 1].astype(compute_dtype)
        s = sample_pixel_coords(
            xg, px, py, mode="bilinear", padding_mode="zeros",
            # gp=2 (160 B rows) measured 8% faster than the heuristic's
            # gp=3 at the full-VRT alignment shape (Cg=10, bf16,
            # 15×128²) — the gather is partly bandwidth-bound; gp=4/6
            # and tap-batched/group-last orderings all regress
            # (scripts/bench_deform_fullscale.py, tpu_kernel_notes)
            window_group=2 if 8 <= cg <= 16 else None,
        )  # (N*G, Ho, Wo, Cg) in x.dtype
        if mask is not None:
            s = s * m_b[..., k][..., None].astype(x.dtype)
        s = s.reshape(n, groups, ho, wo, cg).transpose(0, 2, 3, 1, 4)
        contrib = jnp.matmul(
            s.reshape(n, ho, wo, cin),
            w_k[k],
            preferred_element_type=compute_dtype,
        )
        out = contrib if out is None else out + contrib

    if bias is not None:
        out = out + bias.astype(compute_dtype)
    return out.astype(x.dtype)


def modulated_deform_conv2d(x, offset, mask, weight, bias=None, stride=1, padding=0, dilation=1):
    """DCNv2: :func:`deform_conv2d` with a modulation mask (reference
    src/vsr/models/VRT/modules/deform_conv.py:144)."""
    return deform_conv2d(x, offset, weight, bias, stride, padding, dilation, mask)
