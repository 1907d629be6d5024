"""IRR-PWC: PWC-Net with iterative residual refinement (Flax).

Capability parity with the reference (src/optical_flow/models/irr/):
6-level shared feature pyramid, bidirectional shift-window cost volumes,
a SHARED dense flow estimator + dilated context network applied at every
level (the "iterative residual" idea), and a learned local-kernel flow
refinement. Flow values are kept in normalised ``div_flow`` units
between levels and rescaled at the boundaries exactly as the reference
does (pwc_modules.py:66-79).

TPU notes: the cost volume is
:func:`vsrlab_tpu.ops.correlation.cost_volume` (vectorised
shift-and-reduce, no Python accumulation into device memory); both flow
directions share weights and run as two calls per level (the per-level
image sizes differ, so directions can't fold into one batch without
padding — they CAN fold per direction, which we do).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vsrlab_tpu.ops.correlation import cost_volume
from vsrlab_tpu.ops.resize import resize_bilinear
from vsrlab_tpu.ops.warp import flow_warp

Dtype = Any

_he = jax.nn.initializers.he_normal()


def _conv(feats, k=3, stride=1, dilation=1, name=None, dtype=None):
    pad = ((k - 1) * dilation) // 2
    return nn.Conv(
        feats,
        (k, k),
        strides=(stride, stride),
        padding=[(pad, pad)] * 2,
        kernel_dilation=(dilation, dilation),
        kernel_init=_he,
        bias_init=jax.nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )


class FeatureExtractor(nn.Module):
    """6-level stride-2 pyramid, finest last in channels
    (reference pwc_modules.py:81-100; returns coarsest-first)."""

    num_chs: Sequence[int] = (3, 16, 32, 64, 96, 128, 196)
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        pyramid = []
        for i, ch in enumerate(self.num_chs[1:]):
            x = nn.leaky_relu(_conv(ch, 3, 2, 1, f"conv{i}_0", self.dtype)(x), 0.1)
            x = nn.leaky_relu(_conv(ch, 3, 1, 1, f"conv{i}_1", self.dtype)(x), 0.1)
            pyramid.append(x)
        return pyramid[::-1]


class FlowEstimatorDense(nn.Module):
    """Densely-connected flow head (reference pwc_modules.py:145-162)."""

    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        for i, ch in enumerate((128, 128, 96, 64, 32)):
            y = nn.leaky_relu(_conv(ch, 3, 1, 1, f"conv{i + 1}", self.dtype)(x), 0.1)
            x = jnp.concatenate([y, x], axis=-1)
        flow = _conv(2, 3, 1, 1, "conv_last", self.dtype)(x)
        return x, flow


class ContextNetwork(nn.Module):
    """Dilated context refinement (reference pwc_modules.py:164-179)."""

    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        for i, (ch, dil) in enumerate(
            ((128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1))
        ):
            x = nn.leaky_relu(_conv(ch, 3, 1, dil, f"conv{i}", self.dtype)(x), 0.1)
        return _conv(2, 3, 1, 1, "conv_out", self.dtype)(x)


class RefineFlow(nn.Module):
    """Learned 3×3 local-kernel smoothing of the flow
    (reference irr_modules.py:29-70): a conv stack predicts per-pixel
    kernels, softmax(-k²)-normalised, applied to the flow via an unfold
    (here: 9 shifted replication-padded views — a dense, XLA-fusible
    formulation of ``nn.Unfold``)."""

    dtype: Dtype = None

    @nn.compact
    def __call__(self, flow, diff_img, feature):
        flow_m = flow - flow.mean(axis=(1, 2), keepdims=True)
        norm2 = jnp.sqrt(jnp.sum(diff_img**2, axis=-1, keepdims=True) + 1e-12)
        x = jnp.concatenate([flow_m, norm2, feature], axis=-1)
        for i, ch in enumerate((128, 128, 64, 64, 32, 32)):
            x = nn.leaky_relu(_conv(ch, 3, 1, 1, f"conv{i}", self.dtype)(x), 0.1)
        feat = _conv(9, 3, 1, 1, "conv_out", self.dtype)(x)
        kernel = jax.nn.softmax(-(feat.astype(jnp.float32) ** 2), axis=-1)

        padded = jnp.pad(flow, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        h, w = flow.shape[1:3]
        taps = [
            padded[:, dy : dy + h, dx : dx + w]  # (B, H, W, 2)
            for dy in range(3)
            for dx in range(3)
        ]
        stacked = jnp.stack(taps, axis=-1)  # (B, H, W, 2, 9)
        return jnp.einsum("bhwct,bhwt->bhwc", stacked, kernel).astype(flow.dtype)


class IRRPWCNet(nn.Module):
    """Bidirectional IRR-PWC (reference irr.py:15-143).

    ``forward(ref, supp)`` returns ``(flows_f, flows_b)`` lists selected
    by ``return_levels`` (negative indices over the 7-entry level list,
    finest last). Flows are in pixels at each level's resolution.
    """

    return_levels: Sequence[int] = (-1, -2, -3, -4)
    div_flow: float = 0.05
    search_range: int = 4
    output_level: int = 4
    dtype: Dtype = None

    @nn.compact
    def __call__(self, ref, supp) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        x1_raw, x2_raw = supp, ref
        b, h_im, w_im, _ = x1_raw.shape

        extractor = FeatureExtractor(dtype=self.dtype, name="feature_pyramid_extractor")
        # one batched pyramid for both frames
        pyr = extractor(jnp.concatenate([x1_raw, x2_raw], axis=0))
        x1_pyr = [jnp.split(p, 2, axis=0)[0] for p in pyr] + [x1_raw]
        x2_pyr = [jnp.split(p, 2, axis=0)[1] for p in pyr] + [x2_raw]

        estimator = FlowEstimatorDense(dtype=self.dtype, name="flow_estimators")
        context = ContextNetwork(dtype=self.dtype, name="context_networks")
        refine = RefineFlow(dtype=self.dtype, name="refine_flow")
        conv_1x1 = [
            _conv(32, 1, 1, 1, f"conv_1x1_{i}", self.dtype) for i in range(4)
        ]

        def warp_units(x, flow_units):
            """Warp by a div_flow-normalised flow: convert the normalised
            units to pixels at x's resolution (reference WarpingLayer,
            pwc_modules.py:107-126) with an out-of-bounds validity mask."""
            hh, ww = x.shape[1:3]
            fpix = flow_units / self.div_flow * jnp.asarray(
                [(ww - 1) / max(w_im - 1, 1), (hh - 1) / max(h_im - 1, 1)],
                flow_units.dtype,
            )
            warped = flow_warp(x, fpix, padding_mode="zeros")
            mask = flow_warp(jnp.ones_like(x), fpix, padding_mode="zeros")
            return warped * (mask >= 1.0).astype(warped.dtype)

        def rescale(flow, to_local: bool):
            """pixel-at-this-level ↔ div_flow units (pwc_modules.py:66-79)."""
            hh, ww = flow.shape[1:3]
            if to_local:
                s = jnp.asarray(
                    [ww / w_im / self.div_flow, hh / h_im / self.div_flow],
                    flow.dtype,
                )
            else:
                s = jnp.asarray(
                    [w_im * self.div_flow / ww, h_im * self.div_flow / hh],
                    flow.dtype,
                )
            return flow * s

        flows_f: List[jnp.ndarray] = []
        flows_b: List[jnp.ndarray] = []
        flow_f = jnp.zeros(x1_pyr[0].shape[:3] + (2,), jnp.float32)
        flow_b = jnp.zeros_like(flow_f)

        for level, (x1, x2) in enumerate(zip(x1_pyr, x2_pyr)):
            hh, ww = x1.shape[1:3]
            if level <= self.output_level:
                if level == 0:
                    x2_warp, x1_warp = x2, x1
                else:
                    flow_f = resize_bilinear(flow_f, (hh, ww), align_corners=True)
                    flow_b = resize_bilinear(flow_b, (hh, ww), align_corners=True)
                    x2_warp = warp_units(x2, flow_f)
                    x1_warp = warp_units(x1, flow_b)

                corr_f = nn.leaky_relu(cost_volume(x1, x2_warp, self.search_range), 0.1)
                corr_b = nn.leaky_relu(cost_volume(x2, x1_warp, self.search_range), 0.1)

                if level != self.output_level:
                    x1_1by1 = nn.leaky_relu(conv_1x1[level](x1), 0.1)
                    x2_1by1 = nn.leaky_relu(conv_1x1[level](x2), 0.1)
                else:
                    x1_1by1, x2_1by1 = x1, x2

                flow_f = rescale(flow_f, to_local=True)
                flow_b = rescale(flow_b, to_local=True)

                xi_f, res_f = estimator(jnp.concatenate([corr_f, x1_1by1, flow_f], -1))
                xi_b, res_b = estimator(jnp.concatenate([corr_b, x2_1by1, flow_b], -1))
                est_f = flow_f + res_f
                est_b = flow_b + res_b

                cont_f = est_f + context(jnp.concatenate([xi_f, est_f], -1))
                cont_b = est_b + context(jnp.concatenate([xi_b, est_b], -1))

                img1_rs = resize_bilinear(x1_raw, (hh, ww), align_corners=True)
                img2_rs = resize_bilinear(x2_raw, (hh, ww), align_corners=True)
                img2_warp = warp_units(img2_rs, rescale(cont_f, to_local=False))
                img1_warp = warp_units(img1_rs, rescale(cont_b, to_local=False))

                flow_f = refine(
                    jax.lax.stop_gradient(cont_f), img1_rs - img2_warp, x1_1by1
                )
                flow_b = refine(
                    jax.lax.stop_gradient(cont_b), img2_rs - img1_warp, x2_1by1
                )

                flow_f = rescale(flow_f, to_local=False)
                flow_b = rescale(flow_b, to_local=False)
            else:
                flow_f = resize_bilinear(flow_f, (hh, ww), align_corners=True)
                flow_b = resize_bilinear(flow_b, (hh, ww), align_corners=True)

            flows_f.append(flow_f)
            flows_b.append(flow_b)

        sel = list(self.return_levels)
        return [flows_f[i] for i in sel], [flows_b[i] for i in sel]
