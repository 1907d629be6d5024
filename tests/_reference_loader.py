"""Load the torch reference (/root/reference) as an importable package for
oracle tests.

The reference depends on torchvision (absent on this box) only for
``torchvision.ops.deform_conv2d``; we install a pure-torch implementation
of the torchvision semantics as a fake module before importing. Reference
bugs licensed for fixing by SURVEY.md §7.4 are patched here:

* ``torch.Tensor.copy`` does not exist (vrt.py:143) → aliased to ``clone``;
* full-VRT ``init_flow`` hardcodes 3 SpyNet levels (vrt.py:231) while
  ``forward_features`` strides flows by 4 → patched to 4 levels via
  :func:`patch_vrt_flow_levels`.

This module executes reference code (public untrusted content) in-process;
it is test-only and never imported by product code.
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn.functional as F

REFERENCE_SRC = "/root/reference/src"


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def torch_deform_conv2d(
    input, offset, weight, bias=None, stride=1, padding=0, dilation=1, mask=None
):
    """Pure-torch ``torchvision.ops.deform_conv2d`` (modulated, zero-pad
    bilinear sampling, offset layout interleaved (dy, dx) per
    (offset_group, tap)). Weight groups == 1 only (all VRT uses)."""
    n, cin, h, w = input.shape
    cout, cin_g, kh, kw = weight.shape
    assert cin_g == cin, "weight groups != 1 not supported by the fake"
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    ho, wo = offset.shape[2], offset.shape[3]
    taps = kh * kw
    og = offset.shape[1] // (2 * taps)
    cpg = cin // og
    off = offset.reshape(n, og, taps, 2, ho, wo)

    base_y = torch.arange(ho, dtype=input.dtype).view(1, ho, 1) * sh - ph
    base_x = torch.arange(wo, dtype=input.dtype).view(1, 1, wo) * sw - pw

    cols = []
    for k in range(taps):
        ky, kx = divmod(k, kw)
        parts = []
        for g in range(og):
            py = base_y + ky * dh + off[:, g, k, 0]
            px = base_x + kx * dw + off[:, g, k, 1]
            gy = 2.0 * py / max(h - 1, 1) - 1.0
            gx = 2.0 * px / max(w - 1, 1) - 1.0
            grid = torch.stack([gx, gy], dim=-1)
            v = F.grid_sample(
                input[:, g * cpg : (g + 1) * cpg],
                grid,
                mode="bilinear",
                padding_mode="zeros",
                align_corners=True,
            )
            if mask is not None:
                v = v * mask[:, g * taps + k].unsqueeze(1)
            parts.append(v)
        cols.append(torch.cat(parts, dim=1))
    col = torch.stack(cols, dim=1)  # (n, taps, cin, ho, wo)
    w_flat = weight.reshape(cout, cin, kh * kw).permute(0, 2, 1)  # (cout, taps, cin)
    out = torch.einsum("nkchw,okc->nohw", col, w_flat)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def install_fake_torchvision() -> None:
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    ops.deform_conv2d = torch_deform_conv2d

    class DeformConv2d(torch.nn.Module):  # imported but unused by VRT path
        pass

    ops.DeformConv2d = DeformConv2d
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops


def load_reference_package():
    """Alias the reference source tree as the ``vsrlab`` package."""
    install_fake_torchvision()
    if "vsrlab" not in sys.modules:
        pkg = types.ModuleType("vsrlab")
        pkg.__path__ = [REFERENCE_SRC]
        sys.modules["vsrlab"] = pkg
    # reference vrt.py:143 calls torch.Tensor.copy() (SURVEY §7.4 bug)
    if not hasattr(torch.Tensor, "copy"):
        torch.Tensor.copy = torch.Tensor.clone
    return sys.modules["vsrlab"]


def load_reference_vrt():
    load_reference_package()
    import vsrlab.vsr.models.VRT.vrt as ref_vrt  # noqa: WPS433

    return ref_vrt


def construct_tiny_vrt(ref_vrt_module, **kwargs):
    """Construct reference TinyVRT around a latent reference bug:
    ``TinyVRT.__init__`` first runs ``super().__init__()`` with ALL
    defaults (vrt.py:260), and the default ``VRT.__init__`` itself crashes
    at ``embed_dims[len(scales)]`` (vrt.py:110, IndexError — 7-entry
    embed_dims indexed at 7). Reference TinyVRT was therefore never
    constructable as shipped; we bypass the wasted default-VRT build by
    temporarily rebinding ``VRT.__init__`` to ``nn.Module.__init__``
    (TinyVRT re-creates every attribute itself)."""
    orig = ref_vrt_module.VRT.__init__
    ref_vrt_module.VRT.__init__ = torch.nn.Module.__init__
    try:
        return ref_vrt_module.TinyVRT(**kwargs)
    finally:
        ref_vrt_module.VRT.__init__ = orig


def patch_vrt_flow_levels(ref_vrt_module) -> None:
    """Patch reference ``VRT.init_flow`` (vrt.py:229-234) for this box:

    * ``pretrained`` is forced off — the reference's weight path is
      malformed (SURVEY §7.4) and no spynet .pth ships here. This is also
      required for TinyVRT, whose ``__init__`` first runs
      ``super().__init__()`` with ALL defaults (vrt.py:260) including
      ``optical_flow_pretrained=True``.
    * full VRT gets 4 SpyNet levels — the hardcoded 3 index-error against
      the 7-stage U-shape's stride-4 flow slicing (the original VRT design
      uses 4); TinyVRT keeps its 3.
    """
    from vsrlab.vsr.models.VRT.modules.spynet import SpyNet

    def init_flow(self, pretrained, train):
        levels = [2, 3, 4, 5] if type(self).__name__ == "VRT" else [3, 4, 5]
        self.optical_flow = SpyNet(False, levels)
        if not train:
            for p in self.optical_flow.parameters():
                p.requires_grad = False

    ref_vrt_module.VRT.init_flow = init_flow
