"""Full-model golden parity: BasicVSR forward vs a torch re-execution.

The strongest parity evidence runnable without datasets: our flax
BasicVSR's weights are exported into a torch functional re-implementation
of the reference semantics (recurrent warps + residual stacks + pixel
shuffle + bilinear residual, reference basicvsr.py:39-83), and the two
forwards must agree to float tolerance. Covers: SpyNet pyramid, zero-pad
boundary handling, backward/forward recurrences, fusion, upsampling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsrlab_tpu.models import BasicVSR

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def t_conv(p, x, stride=1, padding=1):
    w = torch.from_numpy(np.asarray(p["kernel"]).transpose(3, 2, 0, 1).copy())
    b = torch.from_numpy(np.asarray(p["bias"]).copy())
    return F.conv2d(x, w, b, stride=stride, padding=padding)


def t_residual_block(params, x):
    """Our ResidualBlock params (head ConvLeaky + scanned res_blocks)."""
    head = params["ConvLeaky_0"]["Conv2d_0"]["Conv_0"]
    x = F.leaky_relu(t_conv(head, x), 0.1)
    rb = params["res_blocks"]
    n = np.asarray(rb["Conv2d_0"]["Conv_0"]["kernel"]).shape[0]
    for i in range(n):
        p1 = {k: np.asarray(v)[i] for k, v in rb["Conv2d_0"]["Conv_0"].items()}
        p2 = {k: np.asarray(v)[i] for k, v in rb["Conv2d_1"]["Conv_0"].items()}
        y = t_conv(p2, F.relu(t_conv(p1, x)))
        x = x + y
    return x


def t_spynet(params, ref, supp):
    """Torch re-execution of the SpyNet pyramid (as in test_spynet.py)."""
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    refs = [(ref - mean) / std]
    supps = [(supp - mean) / std]
    for _ in range(5):
        refs.append(F.avg_pool2d(refs[-1], 2, 2, count_include_pad=False))
        supps.append(F.avg_pool2d(supps[-1], 2, 2, count_include_pad=False))
    refs, supps = refs[::-1], supps[::-1]

    def head(level, x):
        p = params[f"basic_module_{level}"]
        for j in range(5):
            x = t_conv(p[f"conv_{j}"]["Conv_0"], x, padding=3)
            if j < 4:
                x = F.relu(x)
        return x

    n, _, h, w = ref.shape
    flow = torch.zeros(n, 2, h // 32, w // 32)
    for level in range(6):
        flow_up = (
            flow
            if level == 0
            else F.interpolate(flow, scale_factor=2, mode="bilinear", align_corners=True) * 2.0
        )
        warped = t_flow_warp(supps[level], flow_up, "border")
        flow = flow_up + head(level, torch.cat([refs[level], warped, flow_up], 1))
    return flow


def t_flow_warp(x, flow_nchw, padding_mode="zeros"):
    n, _, h, w = x.shape
    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack((gx, gy), 2).float()
    gf = grid + flow_nchw.permute(0, 2, 3, 1)
    gfx = 2.0 * gf[..., 0] / max(w - 1, 1) - 1.0
    gfy = 2.0 * gf[..., 1] / max(h - 1, 1) - 1.0
    return F.grid_sample(
        x, torch.stack((gfx, gfy), 3), mode="bilinear",
        padding_mode=padding_mode, align_corners=True,
    )


class TestBasicVSROracle:
    def test_full_forward_matches_torch(self, rng):
        mid, blocks, t_frames = 8, 2, 4
        h, w = 32, 32  # multiple of 32: no spynet resize path
        model = BasicVSR(mid_channels=mid, res_blocks=blocks, upscale=4)
        lrs_np = rng.random((1, t_frames, h, w, 3)).astype(np.float32)
        lrs = jnp.asarray(lrs_np)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), lrs)
        got = np.asarray(model.apply(variables, lrs))

        p = jax.tree.map(np.asarray, variables["params"])
        x = torch.from_numpy(lrs_np.transpose(0, 1, 4, 2, 3).copy())  # (1,T,3,H,W)

        # flows between adjacent frames, both directions
        x1 = x[0, :-1]
        x2 = x[0, 1:]
        flow_bwd = t_spynet(p["spynet"], x1, x2)   # (T-1, 2, H, W)
        flow_fwd = t_spynet(p["spynet"], x2, x1)

        # backward recurrence (reference basicvsr.py:46-60)
        outputs = []
        feat = torch.zeros(1, mid, h, w)
        for i in range(t_frames - 1, -1, -1):
            if i < t_frames - 1:
                feat = t_flow_warp(feat, flow_bwd[i : i + 1])
            feat = t_residual_block(
                p["backward_resblocks"]["ResidualBlock_0"],
                torch.cat([x[:, i], feat], 1),
            )
            outputs.append(feat)
        outputs = outputs[::-1]

        # forward recurrence + fusion + upsample (reference :62-83)
        feat = torch.zeros_like(feat)
        srs = []
        for i in range(t_frames):
            if i > 0:
                feat = t_flow_warp(feat, flow_fwd[i - 1 : i])
            feat = t_residual_block(
                p["forward_resblocks"]["ResidualBlock_0"],
                torch.cat([x[:, i], feat], 1),
            )
            out = torch.cat([outputs[i], feat], 1)
            out = F.leaky_relu(t_conv(p["point_conv"]["Conv_0"], out, padding=0), 0.1)
            for u in range(2):
                out = t_conv(p[f"upsample_{u}"]["Conv2d_0"]["Conv_0"], out)
                out = F.pixel_shuffle(out, 2)
            out = F.leaky_relu(t_conv(p["conv_hr"]["Conv_0"], out), 0.1)
            out = t_conv(p["conv_last"]["Conv_0"], out)
            base = F.interpolate(
                x[:, i], scale_factor=4, mode="bilinear", align_corners=False
            )
            srs.append(out + base)
        want = torch.stack(srs, 1).permute(0, 1, 3, 4, 2).numpy()

        np.testing.assert_allclose(got, want, atol=5e-4)
