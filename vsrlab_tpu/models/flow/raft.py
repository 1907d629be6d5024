"""RAFT optical flow (Flax, channels-last).

Capability parity with the reference (src/optical_flow/models/raft/):
feature + context encoders at 1/8 resolution, an all-pairs correlation
volume pooled into a 4-level pyramid, and an iterative ConvGRU update
loop refining pixel coordinates, with bilinear radius-window correlation
lookups per iteration.

TPU notes: the all-pairs correlation is one big batched matmul
(MXU-bound); pyramid lookups are dense gathers via
:func:`vsrlab_tpu.ops.warp.sample_pixel_coords`; ``load_torch_raft``
imports the reference's shipped ``raft-small.pth`` weights
(reference raft.py:33-38), giving golden-value parity without training.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vsrlab_tpu.ops.pooling import avg_pool2d
from vsrlab_tpu.ops.resize import resize_bilinear
from vsrlab_tpu.ops.warp import sample_pixel_coords

Dtype = Any

_he = jax.nn.initializers.he_normal()


def _conv(feats, k, stride=1, pad=None, name=None, dtype=None, use_bias=True):
    if pad is None:
        pad = k // 2
    return nn.Conv(
        feats,
        (k, k),
        strides=(stride, stride),
        padding=[(pad, pad)] * 2,
        use_bias=use_bias,
        kernel_init=_he,
        dtype=dtype,
        name=name,
    )


class InstanceNorm(nn.Module):
    """torch InstanceNorm2d(affine=False): per-sample, per-channel
    normalisation over (H, W)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


def _norm(kind: str, name: str):
    if kind == "instance":
        return InstanceNorm(name=name)
    if kind == "none":
        return lambda x: x
    if kind == "batch":
        # eval-mode batch norm without tracked stats ≙ instance stats over
        # the batch; adequate for frozen-feature use (no pretrained
        # raft-basic weights ship with the reference)
        return InstanceNorm(name=name)
    raise ValueError(kind)


class BottleneckBlock(nn.Module):
    """1x1 → 3x3(stride) → 1x1 residual (reference extractor.py:41-80)."""

    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        p4 = self.planes // 4
        y = nn.relu(_norm(self.norm_fn, "norm1")(_conv(p4, 1, 1, 0, "conv1", self.dtype)(x)))
        y = nn.relu(_norm(self.norm_fn, "norm2")(_conv(p4, 3, self.stride, 1, "conv2", self.dtype)(y)))
        y = nn.relu(_norm(self.norm_fn, "norm3")(_conv(self.planes, 1, 1, 0, "conv3", self.dtype)(y)))
        if self.stride != 1:
            x = _norm(self.norm_fn, "norm4")(
                _conv(self.planes, 1, self.stride, 0, "downsample", self.dtype)(x)
            )
        return nn.relu(x + y)


class ResidualBlockRAFT(nn.Module):
    """3x3 → 3x3 residual (reference extractor.py:4-39)."""

    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        y = nn.relu(_norm(self.norm_fn, "norm1")(_conv(self.planes, 3, self.stride, 1, "conv1", self.dtype)(x)))
        y = nn.relu(_norm(self.norm_fn, "norm2")(_conv(self.planes, 3, 1, 1, "conv2", self.dtype)(y)))
        if self.stride != 1:
            x = _norm(self.norm_fn, "norm3")(
                _conv(self.planes, 1, self.stride, 0, "downsample", self.dtype)(x)
            )
        return nn.relu(x + y)


class SmallEncoder(nn.Module):
    """1/8-res feature encoder, bottleneck blocks (extractor.py:146-202)."""

    output_dim: int = 128
    norm_fn: str = "instance"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = _conv(32, 7, 2, 3, "conv1", self.dtype)(x)
        x = nn.relu(_norm(self.norm_fn, "norm1")(x))
        for i, (dim, stride) in enumerate([(32, 1), (64, 2), (96, 2)]):
            x = BottleneckBlock(dim, self.norm_fn, stride, self.dtype, name=f"layer{i + 1}_0")(x)
            x = BottleneckBlock(dim, self.norm_fn, 1, self.dtype, name=f"layer{i + 1}_1")(x)
        return _conv(self.output_dim, 1, 1, 0, "conv2", self.dtype)(x)


class BasicEncoder(nn.Module):
    """1/8-res feature encoder, residual blocks (extractor.py:82-144)."""

    output_dim: int = 256
    norm_fn: str = "instance"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = _conv(64, 7, 2, 3, "conv1", self.dtype)(x)
        x = nn.relu(_norm(self.norm_fn, "norm1")(x))
        for i, (dim, stride) in enumerate([(64, 1), (96, 2), (128, 2)]):
            x = ResidualBlockRAFT(dim, self.norm_fn, stride, self.dtype, name=f"layer{i + 1}_0")(x)
            x = ResidualBlockRAFT(dim, self.norm_fn, 1, self.dtype, name=f"layer{i + 1}_1")(x)
        return _conv(self.output_dim, 1, 1, 0, "conv2", self.dtype)(x)


class FlowHead(nn.Module):
    hidden_dim: int = 256
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(_conv(self.hidden_dim, 3, 1, 1, "conv1", self.dtype)(x))
        return _conv(2, 3, 1, 1, "conv2", self.dtype)(x)


class ConvGRU(nn.Module):
    hidden_dim: int = 96
    dtype: Dtype = None

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(_conv(self.hidden_dim, 3, 1, 1, "convz", self.dtype)(hx))
        r = jax.nn.sigmoid(_conv(self.hidden_dim, 3, 1, 1, "convr", self.dtype)(hx))
        q = jnp.tanh(
            _conv(self.hidden_dim, 3, 1, 1, "convq", self.dtype)(
                jnp.concatenate([r * h, x], axis=-1)
            )
        )
        return (1 - z) * h + z * q


class SepConvGRU(nn.Module):
    """1x5 then 5x1 separable GRU (reference update.py:33-59)."""

    hidden_dim: int = 128
    dtype: Dtype = None

    def _gru(self, h, x, ks, pad, suffix):
        hx = jnp.concatenate([h, x], axis=-1)
        conv = lambda nm: nn.Conv(
            self.hidden_dim, ks, padding=pad, kernel_init=_he,
            dtype=self.dtype, name=nm + suffix,
        )
        z = jax.nn.sigmoid(conv("convz")(hx))
        r = jax.nn.sigmoid(conv("convr")(hx))
        q = jnp.tanh(conv("convq")(jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q

    @nn.compact
    def __call__(self, h, x):
        h = self._gru(h, x, (1, 5), [(0, 0), (2, 2)], "1")
        h = self._gru(h, x, (5, 1), [(2, 2), (0, 0)], "2")
        return h


class SmallMotionEncoder(nn.Module):
    corr_planes: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(_conv(96, 1, 1, 0, "convc1", self.dtype)(corr))
        flo = nn.relu(_conv(64, 7, 1, 3, "convf1", self.dtype)(flow))
        flo = nn.relu(_conv(32, 3, 1, 1, "convf2", self.dtype)(flo))
        out = nn.relu(
            _conv(80, 3, 1, 1, "conv", self.dtype)(
                jnp.concatenate([cor, flo], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)


class BasicMotionEncoder(nn.Module):
    corr_planes: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(_conv(256, 1, 1, 0, "convc1", self.dtype)(corr))
        cor = nn.relu(_conv(192, 3, 1, 1, "convc2", self.dtype)(cor))
        flo = nn.relu(_conv(128, 7, 1, 3, "convf1", self.dtype)(flow))
        flo = nn.relu(_conv(64, 3, 1, 1, "convf2", self.dtype)(flo))
        out = nn.relu(
            _conv(126, 3, 1, 1, "conv", self.dtype)(
                jnp.concatenate([cor, flo], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)


class SmallUpdateBlock(nn.Module):
    corr_planes: int
    hidden_dim: int = 96
    dtype: Dtype = None

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = SmallMotionEncoder(self.corr_planes, self.dtype, name="encoder")(flow, corr)
        net = ConvGRU(self.hidden_dim, self.dtype, name="gru")(
            net, jnp.concatenate([inp, motion], axis=-1)
        )
        delta = FlowHead(128, self.dtype, name="flow_head")(net)
        return net, delta


class BasicUpdateBlock(nn.Module):
    corr_planes: int
    hidden_dim: int = 128
    dtype: Dtype = None

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(self.corr_planes, self.dtype, name="encoder")(flow, corr)
        net = SepConvGRU(self.hidden_dim, self.dtype, name="gru")(
            net, jnp.concatenate([inp, motion], axis=-1)
        )
        delta = FlowHead(256, self.dtype, name="flow_head")(net)
        return net, delta


def _corr_pyramid(fmap1, fmap2, num_levels):
    """All-pairs correlation (one matmul) + avg-pool pyramid
    (reference corr.py:5-22). Returns list of (B*H1*W1, h, w, 1)."""
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c).astype(jnp.float32)
    f2 = fmap2.reshape(b, h * w, c).astype(jnp.float32)
    corr = jnp.einsum("bic,bjc->bij", f1, f2, preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.float32(c))
    corr = corr.reshape(b * h * w, h, w, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = avg_pool2d(corr, 2, 2)
        pyramid.append(corr)
    return pyramid


def _corr_lookup(pyramid, coords, radius):
    """Bilinear window lookup around per-pixel coords at every level
    (reference corr.py:24-42). coords: (B, H1, W1, 2) pixel coords."""
    b, h1, w1, _ = coords.shape
    r = radius
    # reference tap layout (corr.py:31-35): the FIRST window axis offsets
    # the x coordinate, the second offsets y — the pretrained conv weights
    # over the 49 window channels expect exactly this ordering
    lin = jnp.linspace(-r, r, 2 * r + 1)
    d0 = jnp.broadcast_to(lin[:, None], (2 * r + 1, 2 * r + 1))  # axis 0
    d1 = jnp.broadcast_to(lin[None, :], (2 * r + 1, 2 * r + 1))  # axis 1
    out = []
    for i, corr in enumerate(pyramid):
        centroid = coords.reshape(b * h1 * w1, 1, 1, 2) / (2**i)
        px = centroid[..., 0] + d0[None]
        py = centroid[..., 1] + d1[None]
        sampled = sample_pixel_coords(corr, px, py, "bilinear", "zeros", True)
        out.append(sampled.reshape(b, h1, w1, -1))
    return jnp.concatenate(out, axis=-1)


class RAFT(nn.Module):
    """RAFT flow estimator (reference raft.py:14-87).

    ``forward(ref, supp)`` semantics match the reference: features are
    computed on (supp, ref), context on supp, and the flow is upsampled
    ×``scale_factor`` with values scaled accordingly.
    Frames are (B, H, W, 3) with H, W divisible by 8.
    """

    small: bool = True
    scale_factor: int = 2
    iters: int = 12
    dtype: Dtype = None

    @nn.compact
    def __call__(self, ref, supp, iters: Optional[int] = None):
        iters = iters or self.iters
        if self.small:
            hidden_dim, context_dim = 96, 64
            corr_levels, corr_radius = 4, 3
            fnet = SmallEncoder(128, "instance", self.dtype, name="fnet")
            cnet = SmallEncoder(hidden_dim + context_dim, "none", self.dtype, name="cnet")
            update = SmallUpdateBlock(
                corr_levels * (2 * corr_radius + 1) ** 2, hidden_dim,
                self.dtype, name="update_block",
            )
        else:
            hidden_dim, context_dim = 128, 128
            corr_levels, corr_radius = 4, 4
            fnet = BasicEncoder(256, "instance", self.dtype, name="fnet")
            cnet = BasicEncoder(hidden_dim + context_dim, "batch", self.dtype, name="cnet")
            update = BasicUpdateBlock(
                corr_levels * (2 * corr_radius + 1) ** 2, hidden_dim,
                self.dtype, name="update_block",
            )

        # both frames through the feature encoder in one batch
        b, h, w, _ = supp.shape
        fmaps = fnet(jnp.concatenate([supp, ref], axis=0))
        fmap1, fmap2 = jnp.split(fmaps, 2, axis=0)

        c = cnet(supp)
        net, inp = jnp.split(c, [hidden_dim], axis=-1)
        net = jnp.tanh(net)
        inp = nn.relu(inp)

        h8, w8 = h // 8, w // 8
        gy, gx = jnp.meshgrid(jnp.arange(h8), jnp.arange(w8), indexing="ij")
        coords0 = jnp.stack([gx, gy], axis=-1).astype(jnp.float32)[None]
        coords0 = jnp.broadcast_to(coords0, (b, h8, w8, 2))
        coords1 = coords0

        pyramid = _corr_pyramid(fmap1, fmap2, corr_levels)

        for _ in range(iters):
            coords1 = jax.lax.stop_gradient(coords1)
            corr = _corr_lookup(pyramid, coords1, corr_radius)
            flow = coords1 - coords0
            net, delta = update(net, inp, corr.astype(net.dtype), flow.astype(net.dtype))
            coords1 = coords1 + delta.astype(jnp.float32)

        flow = coords1 - coords0
        s = self.scale_factor
        up = resize_bilinear(flow, (h8 * s, w8 * s), align_corners=True) * s
        return up


def load_torch_raft(state_dict, small: bool = True) -> dict:
    """Convert the reference's torch RAFT checkpoint (e.g.
    ``raft-small.pth``, keys possibly ``module.``-prefixed) to flax params
    for :class:`RAFT`."""

    def a(t):
        return np.asarray(t)

    sd = {k.partition("module.")[-1] if k.startswith("module.") else k: v
          for k, v in state_dict.items()}

    params: Dict[str, Any] = {}

    def put(path, kernel, bias=None, transpose=True):
        node = params
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        leaf = {"kernel": a(kernel).transpose(2, 3, 1, 0) if transpose else a(kernel)}
        if bias is not None:
            leaf["bias"] = a(bias)
        node[parts[-1]] = leaf

    def conv_at(dst, src):
        put(dst, sd[f"{src}.weight"], sd.get(f"{src}.bias"))

    for enc in ("fnet", "cnet"):
        conv_at(f"{enc}/conv1", f"{enc}.conv1")
        conv_at(f"{enc}/conv2", f"{enc}.conv2")
        for layer in (1, 2, 3):
            for blk in (0, 1):
                base = f"{enc}.layer{layer}.{blk}"
                dst = f"{enc}/layer{layer}_{blk}"
                names = ("conv1", "conv2", "conv3") if small else ("conv1", "conv2")
                for cname in names:
                    conv_at(f"{dst}/{cname}", f"{base}.{cname}")
                if f"{base}.downsample.0.weight" in sd:
                    conv_at(f"{dst}/downsample", f"{base}.downsample.0")

    ub = "update_block"
    enc_names = (
        ("convc1", "convf1", "convf2", "conv")
        if small
        else ("convc1", "convc2", "convf1", "convf2", "conv")
    )
    for cname in enc_names:
        conv_at(f"{ub}/encoder/{cname}", f"{ub}.encoder.{cname}")
    gru_names = (
        ("convz", "convr", "convq")
        if small
        else ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2")
    )
    for cname in gru_names:
        conv_at(f"{ub}/gru/{cname}", f"{ub}.gru.{cname}")
    conv_at(f"{ub}/flow_head/conv1", f"{ub}.flow_head.conv1")
    conv_at(f"{ub}/flow_head/conv2", f"{ub}.flow_head.conv2")
    return params
