"""3-D shifted-window attention with mutual attention (Flax).

Capability parity with the reference WindowAttention
(src/vsr/models/VRT/modules/window_attention.py:9-238), TPU-first:

* window partition/reverse are pure reshapes/transposes XLA folds away;
* the shift mask is computed once per (padded shape, window, shift) in
  numpy at TRACE time and baked into the program as a constant — the
  analogue of the reference's ``@lru_cache compute_mask``;
* self-attention and both mutual-attention directions run as batched
  einsum matmuls over all windows at once (MXU-shaped);
* mutual attention splits each temporal-window-2 token block into its
  two frames and cross-attends them both ways (reference :138-167).
"""

from __future__ import annotations

import math
from functools import lru_cache, reduce
from operator import mul
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

# torch-default Linear init, shared with the conv blocks (one source of
# truth for the init convention)
from vsrlab_tpu.nn.blocks import (  # noqa: E402
    torch_conv_kernel_init as _linear_init,
    uniform_bias_init as _bias_init,
)


def _dense(features: int, in_features: int, use_bias: bool = True, dtype=None, name=None):
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=_linear_init,
        bias_init=_bias_init(in_features),
        dtype=dtype,
        name=name,
    )


def window_partition(x: jnp.ndarray, window_size: Sequence[int]) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B*nW, wd*wh*ww, C) (reference :10-23)."""
    b, d, h, w, c = x.shape
    wd, wh, ww = window_size
    x = x.reshape(b, d // wd, wd, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wd * wh * ww, c)


def window_reverse(
    windows: jnp.ndarray, window_size: Sequence[int], b: int, d: int, h: int, w: int
) -> jnp.ndarray:
    """Inverse of :func:`window_partition` (reference :25-41)."""
    wd, wh, ww = window_size
    x = windows.reshape(b, d // wd, h // wh, w // ww, wd, wh, ww, -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d, h, w, -1)


def get_window_size(
    x_size: Sequence[int],
    window_size: Sequence[int],
    shift_size: Optional[Sequence[int]] = None,
):
    """Shrink window (and zero shift) along dims where input ≤ window
    (reference :43-58)."""
    ws = list(window_size)
    ss = list(shift_size) if shift_size is not None else None
    for i, xs in enumerate(x_size):
        if xs <= window_size[i]:
            ws[i] = xs
            if ss is not None:
                ss[i] = 0
    if ss is None:
        return tuple(ws)
    return tuple(ws), tuple(ss)


@lru_cache(maxsize=64)
def compute_mask(
    dp: int, hp: int, wp: int, window_size: Tuple[int, ...], shift_size: Tuple[int, ...]
) -> np.ndarray:
    """Shift-attention mask (nW, N, N) with 0 / -100 entries
    (reference :60-77). Pure numpy: evaluated once per static shape at
    trace time and embedded as an XLA constant."""
    ws, ss = window_size, shift_size
    img = np.zeros((dp, hp, wp), np.int32)
    cnt = 0
    for d in (slice(-ws[0]), slice(-ws[0], -ss[0] or None), slice(-ss[0] or dp, None)):
        for h in (slice(-ws[1]), slice(-ws[1], -ss[1] or None), slice(-ss[1] or hp, None)):
            for w in (slice(-ws[2]), slice(-ws[2], -ss[2] or None), slice(-ss[2] or wp, None)):
                img[d, h, w] = cnt
                cnt += 1
    # partition into windows
    img = img.reshape(dp // ws[0], ws[0], hp // ws[1], ws[1], wp // ws[2], ws[2])
    img = img.transpose(0, 2, 4, 1, 3, 5).reshape(-1, reduce(mul, ws))
    diff = img[:, None, :] - img[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class FactoredMask(NamedTuple):
    """Window-type factorisation of the shift-attention mask.

    The dense ``compute_mask`` tensor is ``(nW, N, N)`` — 1.8 GB of
    trace-time CONSTANT for full VRT at 16×256×256 (window (6,8,8) →
    3072 windows × 384² entries), which overflows the compile service
    and would be absurd to ship per TMSAG. But the Swin region structure
    admits only a handful of DISTINCT window masks: along each axis,
    every window except the LAST sees one uniform region (the region
    boundaries live at ``size-ws`` and ``size-ss``, both inside the last
    window), so a window's mask depends only on which axes it is last
    along — at most 2³ = 8 distinct ``(N, N)`` masks. We ship those
    (``masks``: (n_types, N, N), ≤ 4.7 MB at N=384) plus a per-window
    type id (``type_ids``: (nW,)), and the attention add becomes a
    type-id gather that XLA fuses into the logits — no giant constant,
    no giant runtime tensor, no awkward reshapes.

    ``labels`` keeps the raw per-axis region labels ((nW_a, ws_a) each)
    for tests.
    """

    masks: np.ndarray
    type_ids: np.ndarray
    labels: Tuple[np.ndarray, np.ndarray, np.ndarray]


@lru_cache(maxsize=64)
def compute_mask_factored(
    dp: int, hp: int, wp: int, window_size: Tuple[int, ...], shift_size: Tuple[int, ...]
) -> FactoredMask:
    """Window-type masks matching ``compute_mask``'s slices
    (reference window_attention.py:61-77): per-axis region 0 =
    ``[0, size-ws)``, region 1 = ``[size-ws, size-ss)``, region 2 =
    ``[size-ss, size)``; cells may attend iff every axis label agrees."""
    labels = []
    for size, ws, ss in zip((dp, hp, wp), window_size, shift_size):
        lab = np.zeros(size, np.int32)
        lab[size - ws :] = 1
        if ss:
            lab[size - ss :] = 2
        labels.append(lab.reshape(size // ws, ws))

    # per axis: row 0 = interior windows (uniform), row 1 = last window
    nws = [l.shape[0] for l in labels]
    axis_rows = [
        np.stack([np.zeros_like(l[0]), l[-1]]) if l.shape[0] > 1 else l[-1:]
        for l in labels
    ]
    n_types = [r.shape[0] for r in axis_rows]
    # combined label per type over window positions (d-major flatten)
    combos = []
    for td in range(n_types[0]):
        for th in range(n_types[1]):
            for tw in range(n_types[2]):
                lab3 = (
                    axis_rows[0][td][:, None, None] * 9
                    + axis_rows[1][th][None, :, None] * 3
                    + axis_rows[2][tw][None, None, :]
                ).reshape(-1)
                combos.append(lab3)
    combos = np.stack(combos)  # (n_types_total, N)
    masks = np.where(
        combos[:, :, None] != combos[:, None, :], -100.0, 0.0
    ).astype(np.float32)

    # per-window type id: is-last flag per axis
    def is_last(nw):
        f = np.zeros(nw, np.int64)
        f[-1] = 1 if nw > 1 else 0
        return f

    fd, fh, fw = (is_last(n) for n in nws)
    sh = (n_types[1] * n_types[2], n_types[2], 1)
    type_ids = (
        fd[:, None, None] * sh[0] + fh[None, :, None] * sh[1] + fw[None, None, :]
    ).reshape(-1).astype(np.int32)
    return FactoredMask(masks, type_ids, tuple(labels))


@lru_cache(maxsize=32)
def relative_position_index(window_size: Tuple[int, ...]) -> np.ndarray:
    """(N, N) index into the relative-position bias table
    (reference :190-209). numpy, trace-time constant."""
    wd, wh, ww = window_size
    coords = np.stack(
        np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # 3, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[..., 0] += wd - 1
    rel[..., 1] += wh - 1
    rel[..., 2] += ww - 1
    rel[..., 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[..., 1] *= 2 * ww - 1
    return rel.sum(-1)


@lru_cache(maxsize=32)
def sine_position_encoding(
    hw: Tuple[int, int], num_pos_feats: int, temperature: float = 10000.0
) -> np.ndarray:
    """Normalised 2-D sine encoding, (1, H*W, 2*num_pos_feats)
    (reference :211-238, normalize=True)."""
    h, w = hw
    scale = 2 * math.pi
    y = np.cumsum(np.ones((h, w)), 0)
    x = np.cumsum(np.ones((h, w)), 1)
    eps = 1e-6
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])], -1).reshape(h, w, -1)
    py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])], -1).reshape(h, w, -1)
    pos = np.concatenate([py, px], -1)  # (H, W, C)
    return pos.reshape(1, h * w, -1).astype(np.float32)


class MlpGEGLU(nn.Module):
    """Gated-GELU MLP: act(fc11(x)) * fc12(x) -> fc2 (reference :79-98)."""

    hidden_features: int
    out_features: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        gate = _dense(self.hidden_features, in_f, dtype=self.dtype, name="fc11")(x)
        val = _dense(self.hidden_features, in_f, dtype=self.dtype, name="fc12")(x)
        h = nn.gelu(gate, approximate=False) * val
        return _dense(self.out_features, self.hidden_features, dtype=self.dtype, name="fc2")(h)


class WindowAttention(nn.Module):
    """Multi-head self attention (+ optional mutual attention) within
    windows. Input ``x``: (B*nW, N, C); ``mask``: (nW, N, N) or None."""

    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    mut_attn: bool = True
    # optional tensor parallelism: shard attention heads over this mesh
    # axis (SURVEY.md §2.8 "optional TP" row). Heads are independent, so
    # sharding axis 1 of (B_, nH, N, hd) runs each head group on its own
    # devices with no collectives until the output projection.
    head_shard_axis: Optional[str] = None
    dtype: Dtype = None

    def _shard_heads(self, t):
        if self.head_shard_axis is None:
            return t
        from jax.sharding import PartitionSpec as P

        # only constrain when a context mesh with the axis is active
        # (jax.set_mesh / use_mesh); otherwise run unsharded — lets the
        # same model trace for init outside a mesh
        mesh = jax.sharding.get_abstract_mesh()
        if mesh.empty or self.head_shard_axis not in mesh.shape:
            return t
        return jax.lax.with_sharding_constraint(
            t, P(None, self.head_shard_axis, None, None)
        )

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        b_, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        scale = self.qk_scale or hd**-0.5

        bias_table = self.param(
            "relative_position_bias_table",
            jax.nn.initializers.truncated_normal(0.02 / 0.87962566),
            (
                (2 * self.window_size[0] - 1)
                * (2 * self.window_size[1] - 1)
                * (2 * self.window_size[2] - 1),
                nh,
            ),
            jnp.float32,
        )
        rpi = jnp.asarray(relative_position_index(tuple(self.window_size)))

        def heads(t):
            t = t.reshape(b_, -1, nh, hd).transpose(0, 2, 1, 3)  # B_, nH, N, hd
            return self._shard_heads(t)

        # fp32 logits budget per block: above this, windows are processed
        # in lax.map chunks so peak memory stays bounded — the QKᵀ tensor
        # for full VRT at 16×256×256 is (3072, 6, 384, 384) f32 = 10.1 GB
        # unchunked, which alone overflows the 16 GB chip. Self and both
        # mutual attentions run inside ONE map body per block: XLA's
        # overlay allocator charges every distinct loop body, so fewer,
        # fatter bodies beat many thin ones (measured 5.9 GB of overlays
        # with three maps per block at a 512 MB budget).
        # A budget that grows to cap chunk count at ~8 was measured and
        # REVERTED: 340 MB chunk bodies leave VMEM and stream through
        # HBM (while-op time 0.45 → 0.69 s per tile, wall time neutral)
        # while raising overlay-memory risk — tpu_kernel_notes round-3
        # perf pass III. 96 MB keeps the chunk body VMEM-resident.
        _LOGITS_BUDGET = 96 * 1024 ** 2

        def core(q, k, v, tid, with_bias: bool):
            """Windowed attention on one chunk: (B_c, nH, nq, hd)."""
            nq = q.shape[2]
            attn = jnp.einsum(
                "bhqd,bhkd->bhqk", q * scale, k,
                preferred_element_type=jnp.float32,
            )
            if with_bias:
                rel = bias_table[rpi[:nq, :nq].reshape(-1)].reshape(nq, nq, nh)
                attn = attn + rel.transpose(2, 0, 1)[None]
            if isinstance(mask, FactoredMask):
                # ≤8 distinct (N, N) masks selected per window row by a
                # one-hot broadcast-add chain (a masks[type_ids] gather
                # would materialise (nW, N, N) — 1.69 GB at full-VRT
                # scale — because TPU gathers don't fuse)
                for t in range(mask.masks.shape[0]):
                    m_t = jnp.asarray(mask.masks[t, :nq, :nq], attn.dtype)
                    eq_t = (tid == t).astype(attn.dtype)
                    attn = attn + eq_t[:, None, None, None] * m_t
            elif mask is not None:
                nw = mask.shape[0]
                bc = attn.shape[0]
                attn = attn.reshape(bc // nw, nw, nh, nq, nq) + mask[
                    :, :nq, :nq
                ].astype(attn.dtype)[None, :, None]
                attn = attn.reshape(bc, nh, nq, nq)
            attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
            return out.transpose(0, 2, 1, 3).reshape(attn.shape[0], nq, -1)

        def block(q, k, v, qkv_m, tid):
            """Self (+ mutual) attention for one window chunk; returns the
            pre-projection concat (B_c, N, C or 2C)."""
            x_out = core(q, k, v, tid, with_bias=True)
            if not self.mut_attn:
                return x_out
            qm, km, vm = qkv_m
            half = n // 2
            x1 = core(qm[:, :, half:], km[:, :, :half], vm[:, :, :half], tid, False)
            x2 = core(qm[:, :, :half], km[:, :, half:], vm[:, :, half:], tid, False)
            return jnp.concatenate(
                [jnp.concatenate([x1, x2], axis=1), x_out], axis=-1
            )

        # self attention QKV (+ sine-encoded mutual QKV)
        qkv = _dense(3 * c, c, self.qkv_bias, self.dtype, "qkv_self")(x)
        q, k, v = (heads(t) for t in jnp.split(qkv, 3, axis=-1))
        qkv_m = None
        if self.mut_attn:
            pos = jnp.asarray(
                sine_position_encoding(
                    (self.window_size[1], self.window_size[2]), c // 2
                )
            )
            pos2 = jnp.tile(pos, (1, 2, 1)).astype(x.dtype)
            qkv_mm = _dense(3 * c, c, self.qkv_bias, self.dtype, "qkv_mut")(x + pos2)
            qkv_m = tuple(heads(t) for t in jnp.split(qkv_mm, 3, axis=-1))

        if isinstance(mask, FactoredMask):
            nw = mask.type_ids.shape[0]
            tid_full = jnp.tile(jnp.asarray(mask.type_ids), b_ // nw)
        else:
            tid_full = jnp.zeros((b_,), jnp.int32)

        row_bytes = nh * n * n * 4
        chunk = b_
        chunkable = mask is None or isinstance(mask, FactoredMask)
        if chunkable and b_ * row_bytes > _LOGITS_BUDGET:
            target = max(1, _LOGITS_BUDGET // row_bytes)
            chunk = 1
            for d in range(1, target + 1):
                if b_ % d == 0:
                    chunk = d

        if chunk == b_:
            x_out = block(q, k, v, qkv_m, tid_full)
        else:

            def rs(t):
                return t.reshape((b_ // chunk, chunk) + t.shape[1:])

            mapped = (
                rs(q), rs(k), rs(v),
                jax.tree.map(rs, qkv_m), rs(tid_full),
            )
            x_out = jax.lax.map(lambda a: block(*a), mapped)
            x_out = x_out.reshape((b_,) + x_out.shape[2:])

        if self.mut_attn:
            return _dense(c, 2 * c, True, self.dtype, "proj")(x_out)
        return _dense(c, c, True, self.dtype, "proj")(x_out)
