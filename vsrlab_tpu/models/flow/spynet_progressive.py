"""Trainable progressive SpyNet (Flax).

Capability parity with the reference's trainable pyramid
(src/optical_flow/models/spynet/model.py, config.py): a stack of
per-level :class:`~vsrlab_tpu.models.spynet.SpyNetBasicModule` heads
where level ``k`` operates on frames resized to ``GConf(k)`` size
(``24·2^k × 32·2^k``) during curriculum training, or to
``full/2^(levels-k)`` at inference. Each level warps the support frame
by the upsampled previous flow (border padding, align_corners=True —
reference nn.py:4-23) and predicts a residual.

The reference's ``BasicModule.forward`` crashes on a NameError
(model.py:43-44 uses the module path as a variable — SURVEY.md §7.4);
this implementation is the intended behavior.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from vsrlab_tpu.models.spynet import SpyNetBasicModule
from vsrlab_tpu.ops.resize import resize_bilinear
from vsrlab_tpu.ops.warp import flow_warp

Dtype = Any

MAX_G = 5
BASE_SIZE = (24, 32)


class GConf:
    """Per-level training image size (reference config.py:3-17)."""

    def __init__(self, level: int):
        assert 0 <= level <= MAX_G
        self.scale = 2**level

    @property
    def image_size(self) -> Tuple[int, int]:
        return (BASE_SIZE[0] * self.scale, BASE_SIZE[1] * self.scale)


class SpyNetProgressive(nn.Module):
    """K-level trainable pyramid.

    ``__call__(frames, train=True, limit_k=-1)`` mirrors the reference
    SpyNet.forward (model.py:75-123): with ``train=True`` every level
    resizes the input pair to its GConf size; otherwise to
    ``full / 2^(levels-k)``. ``limit_k`` runs only the first k levels
    (the progressive curriculum). Flows are (dx, dy) channels-last.
    """

    k: int = 6
    return_levels: Sequence[int] = (2, 3, 4)
    dtype: Dtype = None

    @nn.compact
    def __call__(
        self,
        frames: Tuple[jnp.ndarray, jnp.ndarray],
        train: bool = True,
        limit_k: int = -1,
    ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        f1, f2 = frames
        b, h, w, _ = f1.shape
        levels = self.k - 1
        n_units = self.k if limit_k == -1 else limit_k

        flow_list: List[jnp.ndarray] = []
        v_prev = None
        for k in range(n_units):
            if train:
                im_size = GConf(k).image_size
            else:
                im_size = (h // 2 ** (levels - k), w // 2 ** (levels - k))

            x1 = resize_bilinear(f1, im_size, align_corners=True)
            x2 = resize_bilinear(f2, im_size, align_corners=True)

            if v_prev is not None:
                v_prev = (
                    resize_bilinear(v_prev, im_size, align_corners=True) * 2.0
                )
                warped = flow_warp(x2, v_prev, padding_mode="border")
                inp = jnp.concatenate([x1, warped, v_prev], axis=-1)
            else:
                zero = jnp.zeros(x1.shape[:3] + (2,), x1.dtype)
                inp = jnp.concatenate([x1, x2, zero], axis=-1)

            vk = SpyNetBasicModule(dtype=self.dtype, name=f"unit_{k}")(inp)
            v_prev = vk + v_prev if v_prev is not None else vk

            if k in self.return_levels:
                flow_list.insert(0, v_prev)

        if len(self.return_levels) == 1:
            return flow_list[0]
        return flow_list
