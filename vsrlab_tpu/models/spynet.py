"""SpyNet coarse-to-fine optical-flow pyramid (Flax, channels-last).

One implementation covers all three reference variants, which are
numerically identical pyramids differing only in what they return:

* BasicVSR's ``Spynet`` (reference
  src/vsr/models/RealBasicVSR/modules/spynet.py:23-93) — ``return_levels=[5]``
* VRT's multi-scale ``SpyNet`` (reference
  src/vsr/models/VRT/modules/spynet.py:81-159) — e.g. ``return_levels=[2,3,4,5]``
* the trainable progressive variant (reference
  src/optical_flow/models/spynet/model.py) — see
  :class:`vsrlab_tpu.models.flow.spynet_progressive`.

Algorithm: 6-level image pyramid via 2×2 average pooling on
ImageNet-normalised frames; at each level the flow is upsampled ×2
(bilinear, align_corners=True, values doubled), the support frame is
warped by it (border padding), and a 5-layer 7×7 conv head predicts a
residual flow. Inputs are bilinearly resized to a multiple of 32 and the
output flow is resized/rescaled back.

TPU notes: the whole pyramid is static-shaped and jit-compiles to dense
convs; callers batch both flow directions (and all frame pairs) into one
call so the 7×7 convs stay MXU-saturated.
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from vsrlab_tpu.ops.pooling import avg_pool2d
from vsrlab_tpu.ops.resize import resize_bilinear
from vsrlab_tpu.ops.warp import flow_warp

Dtype = Any

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class _ConvLeaf(nn.Module):
    """Declares nn.Conv-layout params (kernel HWIO + bias) without
    computing, so alternative compute paths can reuse the exact param
    tree that ``Conv2d`` (which nests an nn.Conv as ``Conv_0``) creates."""

    kh: int
    kw: int
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        from vsrlab_tpu.nn.blocks import torch_conv_kernel_init, uniform_bias_init

        k = self.param(
            "kernel",
            torch_conv_kernel_init,
            (self.kh, self.kw, self.cin, self.cout),
            jnp.float32,
        )
        b = self.param(
            "bias",
            uniform_bias_init(self.kh * self.kw * self.cin),
            (self.cout,),
            jnp.float32,
        )
        return k, b


class _ConvParams(nn.Module):
    kh: int
    kw: int
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        return _ConvLeaf(self.kh, self.kw, self.cin, self.cout, name="Conv_0")()


class SpyNetBasicModule(nn.Module):
    """Per-level flow head: 5 × (7×7 conv), ReLU between, 8→32→64→32→16→2
    (reference src/vsr/models/VRT/modules/spynet.py:65-79).

    TPU lowering: channel widths 8..64..2 leave most of the 128-lane MXU
    tile padded, so by default the whole head runs in space-to-depth-by-2
    form — 5×5 convs on 4×-wide channels with exactly-derived kernels
    (:mod:`vsrlab_tpu.ops.s2d_conv`) — and converts back once at the end.
    Math is identical (same products, different summation order); the
    param tree matches the plain Conv2d layout, so checkpoints and the
    torch importer are unaffected. Falls back to plain convs for odd
    spatial sizes (coarsest pyramid level of small inputs).
    """

    dtype: Dtype = None
    use_s2d: bool = True

    @nn.compact
    def __call__(self, x):
        from vsrlab_tpu.ops.s2d_conv import (
            conv_s2d,
            depth_to_space,
            s2d_bias,
            s2d_kernel,
            space_to_depth,
        )

        chans = [(x.shape[-1], 32), (32, 64), (64, 32), (32, 16), (16, 2)]
        params = [
            _ConvParams(7, 7, ci, co, name=f"conv_{i}")()
            for i, (ci, co) in enumerate(chans)
        ]
        n, h, w, _ = x.shape
        dt = self.dtype or x.dtype

        if self.use_s2d and h % 2 == 0 and w % 2 == 0:
            xs = space_to_depth(x).astype(dt)
            for i, (k, b) in enumerate(params):
                wp = s2d_kernel(k).astype(dt)
                xs = conv_s2d(xs, wp) + s2d_bias(b).astype(dt)
                if i < len(params) - 1:
                    xs = nn.relu(xs)
            return depth_to_space(xs)

        for i, (k, b) in enumerate(params):
            xc = x.astype(dt)
            kc = k.astype(dt)
            dn = jax.lax.conv_dimension_numbers(
                xc.shape, kc.shape, ("NHWC", "HWIO", "NHWC")
            )
            x = (
                jax.lax.conv_general_dilated(
                    xc, kc, (1, 1), [(3, 3), (3, 3)], dimension_numbers=dn
                )
                + b.astype(dt)
            )
            if i < len(params) - 1:
                x = nn.relu(x)
        return x


class SpyNet(nn.Module):
    """6-level SpyNet pyramid.

    Args:
      return_levels: which pyramid levels to emit; level 5 is full
        resolution, level ``k`` is 1/2^(5-k) scale. A single level returns
        one array, several return a list ordered fine→coarse (matching the
        reference's ``flow_list`` ordering).

    Input: ``ref``, ``supp`` frames ``(N, H, W, 3)`` in [0, 1].
    Output: flow(s) ``(N, H/s, W/s, 2)`` with (dx, dy) pixel displacements.
    """

    return_levels: Sequence[int] = (5,)
    levels: int = 6
    dtype: Dtype = None

    def setup(self):
        # one compact method per module is a Flax constraint and the flow
        # pyramid has two public entry points, so heads are set up here
        self.heads = [
            SpyNetBasicModule(dtype=self.dtype, name=f"basic_module_{i}")
            for i in range(self.levels)
        ]

    def _build_pyramid(self, x: jnp.ndarray, h_up: int, w_up: int):
        """Resize to the /32 multiple, ImageNet-normalise, build the
        ``levels``-deep 2× average-pool pyramid. Returns coarse→fine."""
        if (h_up, w_up) != x.shape[1:3]:
            x = resize_bilinear(x, (h_up, w_up), align_corners=False)
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        pyr = [(x - mean) / std]
        for _ in range(self.levels - 1):
            pyr.append(avg_pool2d(pyr[-1], 2, 2))
        return pyr[::-1]  # coarse -> fine

    def _flows(
        self,
        ref_pyr: List[jnp.ndarray],
        supp_pyr: List[jnp.ndarray],
        h: int,
        w: int,
        h_up: int,
        w_up: int,
    ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        """Coarse-to-fine refinement over prebuilt pyramids."""
        n = ref_pyr[0].shape[0]
        heads = self.heads
        flows_out: List[jnp.ndarray] = []
        flow = jnp.zeros(
            (n, h_up // 32, w_up // 32, 2), dtype=ref_pyr[0].dtype
        )
        for level in range(self.levels):
            if level == 0:
                # zero flow + border padding: the warp is an exact identity
                flow_up = flow
                warped = supp_pyr[0]
            else:
                lh, lw = ref_pyr[level].shape[1:3]
                flow_up = (
                    resize_bilinear(flow, (lh, lw), align_corners=True) * 2.0
                )
                warped = flow_warp(
                    supp_pyr[level], flow_up, padding_mode="border"
                )
            residue = heads[level](
                jnp.concatenate([ref_pyr[level], warped, flow_up], axis=-1)
            )
            flow = flow_up + residue

            if level in self.return_levels:
                scale = 2 ** (self.levels - 1 - level)
                out = resize_bilinear(
                    flow, (h // scale, w // scale), align_corners=False
                )
                sx = float(w // scale) / float(w_up // scale)
                sy = float(h // scale) / float(h_up // scale)
                out = out * jnp.asarray([sx, sy], out.dtype)
                flows_out.insert(0, out)

        return flows_out[0] if len(flows_out) == 1 else flows_out

    def __call__(
        self, ref: jnp.ndarray, supp: jnp.ndarray
    ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        n, h, w, _ = ref.shape
        h_up = int(math.ceil(h / 32.0) * 32)
        w_up = int(math.ceil(w / 32.0) * 32)

        # one resize/normalise/pool chain for both stacks (halves the
        # small-op count vs separate ref/supp pyramids; bitwise identical
        # because every op is per-plane)
        pyr = self._build_pyramid(
            jnp.concatenate([ref, supp], axis=0), h_up, w_up
        )
        ref_pyr = [p[:n] for p in pyr]
        supp_pyr = [p[n:] for p in pyr]
        return self._flows(ref_pyr, supp_pyr, h, w, h_up, w_up)

    def adjacent_pairs(
        self, frames: jnp.ndarray, t: int
    ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        """Both-direction flows for all adjacent frame pairs of clips.

        ``frames`` is ``(B·t, H, W, 3)`` (clips flattened row-major). The
        image pyramid is built ONCE on the ``B·t`` unique frames and the
        ``2·B·(t-1)`` ref/supp stacks are slices of it — ~3.6× less
        resize/normalise/pool work than the generic ``__call__`` on
        materialised pair stacks, bitwise identical (every pyramid op is
        per-plane). Output layout matches
        ``__call__(concat([f[:-1], f[1:]]), concat([f[1:], f[:-1]]))``:
        first half backward flows (ref = earlier frame), second half
        forward flows (reference
        src/vsr/models/RealBasicVSR/modules/basicvsr.py:30-37).
        """
        bt, h, w, _ = frames.shape
        b = bt // t
        h_up = int(math.ceil(h / 32.0) * 32)
        w_up = int(math.ceil(w / 32.0) * 32)

        pyr = self._build_pyramid(frames, h_up, w_up)

        ref_pyr, supp_pyr = [], []
        for p in pyr:
            pb = p.reshape((b, t) + p.shape[1:])
            earlier = pb[:, :-1].reshape((b * (t - 1),) + p.shape[1:])
            later = pb[:, 1:].reshape((b * (t - 1),) + p.shape[1:])
            ref_pyr.append(jnp.concatenate([earlier, later], axis=0))
            supp_pyr.append(jnp.concatenate([later, earlier], axis=0))
        return self._flows(ref_pyr, supp_pyr, h, w, h_up, w_up)
