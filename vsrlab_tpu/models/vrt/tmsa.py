"""TMSA / TMSAG / RTMSA blocks (Flax, channels-last).

Capability parity with the reference (src/vsr/models/VRT/modules/tmsa.py):

* TMSA: LayerNorm → pad-to-window-multiple → cyclic roll → window
  partition → WindowAttention → reverse → un-roll → crop, with
  stochastic-depth residuals and a GEGLU FFN (reference :61-126);
* TMSAG: a stack of TMSA blocks with alternating zero / half-window
  shifts, sharing one trace-time-constant shift mask (reference :128-202);
* RTMSA: residual TMSAG + linear (stage-8 trunk, reference :204-251).

Everything is (B, D, H, W, C); the reference's `b c d h w` transposes
do not exist here.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vsrlab_tpu.models.vrt.window_attention import (
    MlpGEGLU,
    WindowAttention,
    _dense,
    compute_mask_factored,
    get_window_size,
    window_partition,
    window_reverse,
)

Dtype = Any


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference stochastic_depth.py:4-23)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class TMSA(nn.Module):
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int] = (6, 8, 8)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    mut_attn: bool = True
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path: float = 0.0
    head_shard_axis: Optional[str] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, mask_matrix=None, deterministic: bool = True):
        b, d, h, w, c = x.shape
        window_size, shift_size = get_window_size(
            (d, h, w), self.window_size, self.shift_size
        )

        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)

        pad_d = (-d) % window_size[0]
        pad_b = (-h) % window_size[1]
        pad_r = (-w) % window_size[2]
        if pad_d or pad_b or pad_r:
            x = jnp.pad(
                x, ((0, 0), (0, pad_d), (0, pad_b), (0, pad_r), (0, 0))
            )
        dp, hp, wp = x.shape[1:4]

        shifted = any(s > 0 for s in shift_size)
        if shifted:
            x = jnp.roll(
                x,
                shift=(-shift_size[0], -shift_size[1], -shift_size[2]),
                axis=(1, 2, 3),
            )
            attn_mask = mask_matrix
        else:
            attn_mask = None

        windows = window_partition(x, window_size)
        # the DECLARED window sizes the relative-position bias table
        # (reference window_attention.py:121-124): with a runtime-shrunk
        # window (input smaller than the declared window) the table must
        # keep its declared shape — the same params serve every input
        # size, and the index is sliced [:N, :N] inside — or apply()
        # after init at a different clip length raises ScopeParamShapeError
        attn = WindowAttention(
            self.dim,
            tuple(self.window_size),
            self.num_heads,
            self.qkv_bias,
            self.qk_scale,
            self.mut_attn,
            head_shard_axis=self.head_shard_axis,
            dtype=self.dtype,
            name="attn",
        )(windows, attn_mask)
        x = window_reverse(attn, window_size, b, dp, hp, wp)

        if shifted:
            x = jnp.roll(x, shift=shift_size, axis=(1, 2, 3))
        if pad_d or pad_b or pad_r:
            x = x[:, :d, :h, :w]

        dpth = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dpth(x, deterministic)

        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = MlpGEGLU(
            int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name="mlp"
        )(y)
        return x + dpth(y, deterministic)


class TMSAG(nn.Module):
    """Group of TMSA blocks with alternating shifts (reference :128-202)."""

    dim: int
    depth: int
    num_heads: int
    window_size: Sequence[int] = (6, 8, 8)
    shift_size: Optional[Sequence[int]] = None
    mut_attn: bool = True
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path: Any = 0.0
    head_shard_axis: Optional[str] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, d, h, w, c = x.shape
        base_shift = (
            tuple(i // 2 for i in self.window_size)
            if self.shift_size is None
            else tuple(self.shift_size)
        )
        window_size, shift_size = get_window_size(
            (d, h, w), self.window_size, base_shift
        )
        dp = -(-d // window_size[0]) * window_size[0]
        hp = -(-h // window_size[1]) * window_size[1]
        wp = -(-w // window_size[2]) * window_size[2]
        # factored per-axis mask: O(bytes) of constants instead of the
        # dense (nW, N, N) tensor, which reaches 1.8 GB of embedded HLO
        # constant for full VRT at 16×256×256 and overflows the compiler
        mask = compute_mask_factored(
            dp, hp, wp, tuple(window_size), tuple(shift_size)
        )

        for i in range(self.depth):
            rate = (
                self.drop_path[i]
                if isinstance(self.drop_path, (list, tuple))
                else self.drop_path
            )
            x = TMSA(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=tuple(self.window_size),
                shift_size=(0, 0, 0) if i % 2 == 0 else base_shift,
                mut_attn=self.mut_attn,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                drop_path=float(rate),
                head_shard_axis=self.head_shard_axis,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, mask, deterministic)
        return x


class RTMSA(nn.Module):
    """x + Linear(TMSAG(x)) — self-attention only (reference :204-251)."""

    dim: int
    depth: int
    num_heads: int
    window_size: Sequence[int]
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path: Any = 0.0
    head_shard_axis: Optional[str] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = TMSAG(
            dim=self.dim,
            depth=self.depth,
            num_heads=self.num_heads,
            window_size=self.window_size,
            mut_attn=False,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            drop_path=self.drop_path,
            head_shard_axis=self.head_shard_axis,
            dtype=self.dtype,
            name="residual_group",
        )(x, deterministic)
        return x + _dense(self.dim, self.dim, True, self.dtype, "linear")(y)
