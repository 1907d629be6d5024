"""Torch checkpoint importers for the model zoo.

Lets users of the torch reference bring their trained weights:

* :func:`load_torch_spynet` — the SpyNet pyramid in either reference
  naming scheme (``spynet-sintel.pth``-style flat keys or the
  BasicVSR/VRT module layout) → :class:`vsrlab_tpu.models.SpyNet` params.
* :func:`load_torch_realbasicvsr` — a full RealBasicVSR checkpoint
  (reference ``checkpoint.tar`` ``model_state_dict``) → params for
  :class:`vsrlab_tpu.models.RealBasicVSR`.
* :func:`load_torch_vrt` — a VRT/TinyVRT checkpoint (reference
  src/vsr/models/VRT/vrt.py module layout) → params for
  :class:`vsrlab_tpu.models.VRT` / ``TinyVRT``.
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

    Accepts any of the layouts in the family:
      * VRT variant: ``basic_module.{i}.basic_module.{0,2,4,6,8}.*``
        (torch Sequential with interleaved ReLUs,
        src/vsr/models/VRT/modules/spynet.py:65-79); a ``params.``
        prefix (the sintel checkpoint wrapper) is stripped;
      * ConvReLU variant ``basic_module.{i}.basic_module.{j}.0.*`` —
        what the reference's positional remap of the sintel checkpoint
        produces (RealBasicVSR/modules/spynet.py:36 inserts ``.0``);
      * mmedit sintel layout ``basic_module.{i}.basic_module.{j}.conv.*``
        (the raw spynet-sintel checkpoint the reference remaps) and its
        ``.conv.0`` ConvModule form.
    """
    sd = {}
    for k, v in state_dict.items():
        k = k[len("params."):] if k.startswith("params.") else k
        sd[k] = v

    params: Dict[str, Any] = {}
    pat = re.compile(r"basic_module\.(\d)\.basic_module\.")
    levels = sorted({int(m.group(1)) for k in sd if (m := pat.match(k))})
    if not levels:
        raise ValueError("unrecognised SpyNet state dict layout")
    for i in levels:
        mod: Dict[str, Any] = {}
        for j in range(5):
            base = f"basic_module.{i}.basic_module"
            candidates = (
                f"{base}.{2 * j}",       # Sequential w/ interleaved ReLUs
                f"{base}.{j}.0",          # ConvReLU(.0 = Conv2d)
                f"{base}.{j}.conv",       # mmedit sintel ConvModule
                f"{base}.{j}.conv.0",     # ConvModule wrapping Sequential
            )
            src = next(
                (c for c in candidates if f"{c}.weight" in sd), None
            )
            if src is None:
                raise ValueError(
                    f"unrecognised SpyNet layout at level {i} conv {j}; "
                    f"tried {candidates}"
                )
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


def _linear(state, key) -> Dict[str, np.ndarray]:
    """torch Linear (out, in) -> flax Dense kernel (in, out)."""
    leaf = {"kernel": _np(state[f"{key}.weight"]).T}
    if f"{key}.bias" in state:
        leaf["bias"] = _np(state[f"{key}.bias"])
    return leaf


def _layernorm(state, key) -> Dict[str, np.ndarray]:
    return {"scale": _np(state[f"{key}.weight"]), "bias": _np(state[f"{key}.bias"])}


def _conv3d_133(state, key) -> Dict[str, np.ndarray]:
    """torch Conv3d (out, in, 1, kh, kw) -> flax 2D conv HWIO."""
    w = _np(state[f"{key}.weight"])[:, :, 0]  # (out, in, kh, kw)
    leaf = {"kernel": w.transpose(2, 3, 1, 0)}
    if f"{key}.bias" in state:
        leaf["bias"] = _np(state[f"{key}.bias"])
    return leaf


def load_torch_vrt(state_dict, n_scale_stages: int) -> dict:
    """Reference VRT/TinyVRT state dict → flax params for
    :class:`vsrlab_tpu.models.VRT` / ``TinyVRT``.

    ``n_scale_stages``: number of U-shape stages (7 for VRT, 5 for
    TinyVRT — reference vrt.py:84,279). The trunk ModuleList is named
    ``stage8``/``stage6`` respectively (vrt.py:106,302).
    """
    sd = {k.partition("module.")[-1] if k.startswith("module.") else k: v
          for k, v in state_dict.items()}
    params: Dict[str, Any] = {}

    def wrap_conv2d(leaf):  # our Conv2d wrapper nests the nn.Conv as Conv_0
        return {"Conv_0": leaf}

    def attention(prefix: str) -> dict:
        out = {
            "relative_position_bias_table": _np(
                sd[f"{prefix}.relative_position_bias_table"]
            ),
            "qkv_self": _linear(sd, f"{prefix}.qkv_self"),
            "proj": _linear(sd, f"{prefix}.proj"),
        }
        if f"{prefix}.qkv_mut.weight" in sd:
            out["qkv_mut"] = _linear(sd, f"{prefix}.qkv_mut")
        return out

    def tmsa_block(prefix: str) -> dict:
        return {
            "norm1": _layernorm(sd, f"{prefix}.norm1"),
            "attn": attention(f"{prefix}.attn"),
            "norm2": _layernorm(sd, f"{prefix}.norm2"),
            "mlp": {
                "fc11": _linear(sd, f"{prefix}.mlp.fc11"),
                "fc12": _linear(sd, f"{prefix}.mlp.fc12"),
                "fc2": _linear(sd, f"{prefix}.mlp.fc2"),
            },
        }

    def tmsag(prefix: str) -> dict:
        out: Dict[str, Any] = {}
        j = 0
        while f"{prefix}.blocks.{j}.norm1.weight" in sd:
            out[f"block_{j}"] = tmsa_block(f"{prefix}.blocks.{j}")
            j += 1
        return out

    def pa_deform(prefix: str) -> dict:
        out: Dict[str, Any] = {
            "weight": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"{prefix}.bias"]),
        }
        # conv_offset Sequential convs at torch indices 0, 2, 4, 6
        for ours, theirs in enumerate((0, 2, 4, 6)):
            leaf = _conv(sd, f"{prefix}.conv_offset.{theirs}")
            out[f"conv_offset_{ours}"] = (
                wrap_conv2d(leaf) if ours < 3 else leaf
            )
        return out

    # stages 1..n
    for i in range(1, n_scale_stages + 1):
        sp = f"stage{i}"
        stage: Dict[str, Any] = {}
        if f"{sp}.reshape.2.weight" in sd:  # down/up: LN at .1, Linear at .2
            stage["reshape_norm"] = _layernorm(sd, f"{sp}.reshape.1")
            stage["reshape_linear"] = _linear(sd, f"{sp}.reshape.2")
        else:  # none: LN at .1
            stage["reshape_norm"] = _layernorm(sd, f"{sp}.reshape.1")
        stage["residual_group1"] = tmsag(f"{sp}.residual_group1")
        stage["residual_group2"] = tmsag(f"{sp}.residual_group2")
        stage["linear1"] = _linear(sd, f"{sp}.linear1")
        stage["linear2"] = _linear(sd, f"{sp}.linear2")
        stage["pa_deform"] = pa_deform(f"{sp}.pa_deform")
        stage["pa_fuse"] = {
            "fc11": _linear(sd, f"{sp}.pa_fuse.fc11"),
            "fc12": _linear(sd, f"{sp}.pa_fuse.fc12"),
            "fc2": _linear(sd, f"{sp}.pa_fuse.fc2"),
        }
        params[sp] = stage

    # trunk ModuleList (stage8 for VRT, stage6 for TinyVRT)
    tp = f"stage{n_scale_stages + 1}"
    params["trunk_norm_in"] = _layernorm(sd, f"{tp}.0.1")
    params["trunk_linear_in"] = _linear(sd, f"{tp}.0.2")
    k = 1
    while f"{tp}.{k}.linear.weight" in sd:
        params[f"trunk_rtmsa_{n_scale_stages + k - 1}"] = {
            "residual_group": tmsag(f"{tp}.{k}.residual_group"),
            "linear": _linear(sd, f"{tp}.{k}.linear"),
        }
        k += 1

    params["norm"] = _layernorm(sd, "norm")
    params["conv_after_body"] = _linear(sd, "conv_after_body")
    params["conv_first"] = wrap_conv2d(_conv3d_133(sd, "conv_first"))
    params["conv_before_upsample"] = wrap_conv2d(
        _conv3d_133(sd, "conv_before_upsample.0")
    )
    # upsample ladder: convs at torch Sequential indices 0, 5, 10 (x4)
    up_idx = [i for i in range(0, 11, 5) if f"upsample.{i}.weight" in sd]
    for ours, theirs in enumerate(up_idx[:-1]):
        params[f"up_conv_{ours}"] = wrap_conv2d(
            _conv3d_133(sd, f"upsample.{theirs}")
        )
    params["up_conv_out"] = wrap_conv2d(_conv3d_133(sd, f"upsample.{up_idx[-1]}"))
    params["conv_last"] = wrap_conv2d(_conv3d_133(sd, "conv_last"))

    spynet_sd = {
        k[len("optical_flow."):]: v
        for k, v in sd.items()
        if k.startswith("optical_flow.") and not k.endswith(("mean", "std"))
    }
    if spynet_sd:
        params["optical_flow"] = load_torch_spynet(spynet_sd)
    return params
