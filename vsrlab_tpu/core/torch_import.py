"""Torch checkpoint importers for the model zoo.

Lets users of the torch reference bring their trained weights:

* :func:`load_torch_spynet` — the SpyNet pyramid in either reference
  naming scheme (``spynet-sintel.pth``-style flat keys or the
  BasicVSR/VRT module layout) → :class:`vsrlab_tpu.models.SpyNet` params.
* :func:`load_torch_realbasicvsr` — a full RealBasicVSR checkpoint
  (reference ``checkpoint.tar`` ``model_state_dict``) → params for
  :class:`vsrlab_tpu.models.RealBasicVSR`.
* RAFT and VGG19 importers live next to their models
  (:func:`vsrlab_tpu.models.flow.load_torch_raft`,
  :func:`vsrlab_tpu.core.perceptual.load_torch_vgg19`).

All converters are pure numpy (torch tensors are accepted and coerced);
conv kernels transpose OIHW → HWIO.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv(state, key) -> Dict[str, np.ndarray]:
    leaf = {"kernel": _np(state[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if f"{key}.bias" in state:
        leaf["bias"] = _np(state[f"{key}.bias"])
    return leaf


def load_torch_spynet(state_dict) -> dict:
    """SpyNet pyramid weights → flax params for
    :class:`vsrlab_tpu.models.spynet.SpyNet`.

    Accepts any of the reference layouts:
      * VRT variant: ``basic_module.{i}.basic_module.{0,2,4,6,8}.*``
        (src/vsr/models/VRT/modules/spynet.py:65-79); a ``params.``
        prefix (the sintel checkpoint wrapper) is stripped;
      * upstream sintel keys ``module.moduleBasic...`` are remapped the
        way the reference does (RealBasicVSR/modules/spynet.py:32-36).
    """
    sd = {}
    for k, v in state_dict.items():
        k = k[len("params."):] if k.startswith("params.") else k
        sd[k] = v

    params: Dict[str, Any] = {}
    pat = re.compile(r"basic_module\.(\d)\.basic_module\.(\d+)\.weight")
    levels = sorted({int(m.group(1)) for k in sd if (m := pat.match(k))})
    if not levels:
        raise ValueError("unrecognised SpyNet state dict layout")
    for i in levels:
        mod: Dict[str, Any] = {}
        for j in range(5):
            # torch Sequential indices 0,2,4,6,8 (ReLUs between)
            src = f"basic_module.{i}.basic_module.{2 * j}"
            if f"{src}.weight" not in sd:
                src = f"basic_module.{i}.basic_module.{j}.0"  # ConvReLU variant
            mod[f"conv_{j}"] = {"Conv_0": _conv(sd, src)}
        params[f"basic_module_{i}"] = mod
    return params


def load_torch_realbasicvsr(state_dict) -> dict:
    """Reference RealBasicVSR ``model_state_dict`` → flax params for
    :class:`vsrlab_tpu.models.RealBasicVSR`.

    Reference module layout (realbasicvsr.py:5-30, basicvsr.py:11-83):
    ``cleaner.{resblock,conv}``, ``basicvsr.{backward_resblocks,
    forward_resblocks,point_conv,upsample,conv_last,spynet}``.
    """
    sd = {k.partition("module.")[-1] if k.startswith("module.") else k: v
          for k, v in state_dict.items()}

    def residual_block(prefix: str) -> dict:
        """ResidualBlock: conv head + N stacked ResidualConv (our scan
        layout stacks the per-block params on a leading axis)."""
        out = {
            "ConvLeaky_0": {
                "Conv2d_0": {"Conv_0": _conv(sd, f"{prefix}.conv.0")}
            }
        }
        idx = 0
        k1s, b1s, k2s, b2s = [], [], [], []
        while f"{prefix}.res_block.{idx}.conv1.weight" in sd:
            k1s.append(_np(sd[f"{prefix}.res_block.{idx}.conv1.weight"]).transpose(2, 3, 1, 0))
            b1s.append(_np(sd[f"{prefix}.res_block.{idx}.conv1.bias"]))
            k2s.append(_np(sd[f"{prefix}.res_block.{idx}.conv2.weight"]).transpose(2, 3, 1, 0))
            b2s.append(_np(sd[f"{prefix}.res_block.{idx}.conv2.bias"]))
            idx += 1
        if idx:
            out["res_blocks"] = {
                "Conv2d_0": {"Conv_0": {"kernel": np.stack(k1s), "bias": np.stack(b1s)}},
                "Conv2d_1": {"Conv_0": {"kernel": np.stack(k2s), "bias": np.stack(b2s)}},
            }
        return out

    params: Dict[str, Any] = {"cleaner": {}, "basicvsr": {}}
    # cleaner: IterativeRefinement {resblock, conv}
    params["cleaner"]["ResidualBlock_0"] = residual_block("cleaner.resblock")
    params["cleaner"]["Conv2d_0"] = {"Conv_0": _conv(sd, "cleaner.conv")}

    bv = params["basicvsr"]
    bv["backward_resblocks"] = {
        "ResidualBlock_0": residual_block("basicvsr.backward_resblocks")
    }
    bv["forward_resblocks"] = {
        "ResidualBlock_0": residual_block("basicvsr.forward_resblocks")
    }
    bv["point_conv"] = {"Conv_0": _conv(sd, "basicvsr.point_conv.0")}
    # upsample: Sequential of PixelShufflePack (upconv)
    i = 0
    while f"basicvsr.upsample.{i}.upconv.weight" in sd:
        bv[f"upsample_{i}"] = {
            "Conv2d_0": {"Conv_0": _conv(sd, f"basicvsr.upsample.{i}.upconv")}
        }
        i += 1
    # conv_last: Sequential(conv 64, lrelu, conv 3)
    bv["conv_hr"] = {"Conv_0": _conv(sd, "basicvsr.conv_last.0")}
    bv["conv_last"] = {"Conv_0": _conv(sd, "basicvsr.conv_last.2")}
    # spynet
    spynet_sd = {
        k[len("basicvsr.spynet."):]: v
        for k, v in sd.items()
        if k.startswith("basicvsr.spynet.") and not k.endswith(("mean", "std"))
    }
    if spynet_sd:
        bv["spynet"] = load_torch_spynet(spynet_sd)
    return params
