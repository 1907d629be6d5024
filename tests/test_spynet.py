"""SpyNet tests: shapes, multi-level returns, and a torch-functional oracle
that re-runs the pyramid with the flax weights to pin down the wiring
(normalisation, pooling, coarse-to-fine upsample/warp/residual, resize-back)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsrlab_tpu.models import SpyNet


@pytest.fixture(scope="module")
def spynet_vars():
    model = SpyNet()
    ref = jnp.zeros((1, 64, 64, 3))
    return model.init(jax.random.PRNGKey(0), ref, ref)


class TestShapes:
    def test_single_level_full_res(self, rng, spynet_vars):
        model = SpyNet()
        ref = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
        supp = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
        flow = model.apply(spynet_vars, ref, supp)
        assert flow.shape == (2, 64, 64, 2)

    @pytest.mark.slow  # padding path; default tier keeps the aligned shapes
    def test_non_multiple_of_32(self, rng, spynet_vars):
        """180x320 pair — the driver's CPU-runnable config #1 shape."""
        model = SpyNet()
        ref = jnp.asarray(rng.random((1, 180, 320, 3)), jnp.float32)
        supp = jnp.asarray(rng.random((1, 180, 320, 3)), jnp.float32)
        flow = model.apply(spynet_vars, ref, supp)
        assert flow.shape == (1, 180, 320, 2)
        assert np.isfinite(np.asarray(flow)).all()

    def test_multi_level_returns(self, rng):
        model = SpyNet(return_levels=(2, 3, 4, 5))
        ref = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
        supp = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), ref, supp)
        flows = model.apply(variables, ref, supp)
        assert isinstance(flows, list) and len(flows) == 4
        # fine -> coarse ordering (reference flow_list.insert(0, ...))
        assert flows[0].shape == (1, 64, 64, 2)
        assert flows[1].shape == (1, 32, 32, 2)
        assert flows[2].shape == (1, 16, 16, 2)
        assert flows[3].shape == (1, 8, 8, 2)


class TestSharedPyramid:
    @pytest.mark.slow  # default tier: torch pyramid oracle covers SpyNet math
    def test_adjacent_pairs_matches_pair_call(self, rng, spynet_vars):
        """adjacent_pairs (one pyramid over unique frames, sliced into
        pair stacks) must be bitwise identical to the generic pair call —
        every pyramid op is per-plane."""
        model = SpyNet()
        b, t, h, w = 2, 4, 64, 96
        clips = jnp.asarray(rng.random((b, t, h, w, 3)), jnp.float32)
        x1 = clips[:, :-1].reshape(-1, h, w, 3)
        x2 = clips[:, 1:].reshape(-1, h, w, 3)
        ref = jnp.concatenate([x1, x2], axis=0)
        supp = jnp.concatenate([x2, x1], axis=0)
        via_pairs = model.apply(spynet_vars, ref, supp)
        via_shared = model.apply(
            spynet_vars, clips.reshape(-1, h, w, 3), t,
            method=SpyNet.adjacent_pairs,
        )
        np.testing.assert_array_equal(
            np.asarray(via_pairs), np.asarray(via_shared)
        )



class TestTorchOracle:
    def test_pyramid_matches_torch(self, rng, spynet_vars):
        """Re-run the full pyramid in torch using the flax weights."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        h, w = 96, 128  # multiple of 32: isolates the pyramid from resizing
        ref_np = rng.random((2, h, w, 3)).astype(np.float32)
        supp_np = rng.random((2, h, w, 3)).astype(np.float32)

        model = SpyNet()
        got = np.asarray(
            model.apply(
                spynet_vars, jnp.asarray(ref_np), jnp.asarray(supp_np)
            )
        )

        # --- torch oracle ---
        params = jax.tree.map(np.asarray, spynet_vars["params"])

        def head(level, x):
            p = params[f"basic_module_{level}"]
            for j in range(5):
                conv = p[f"conv_{j}"]["Conv_0"]
                wgt = torch.from_numpy(conv["kernel"].transpose(3, 2, 0, 1))
                b = torch.from_numpy(conv["bias"])
                x = F.conv2d(x, wgt, b, stride=1, padding=3)
                if j < 4:
                    x = F.relu(x)
            return x

        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        ref_t = torch.from_numpy(ref_np.transpose(0, 3, 1, 2))
        supp_t = torch.from_numpy(supp_np.transpose(0, 3, 1, 2))
        refs = [(ref_t - mean) / std]
        supps = [(supp_t - mean) / std]
        for _ in range(5):
            refs.append(F.avg_pool2d(refs[-1], 2, 2, count_include_pad=False))
            supps.append(F.avg_pool2d(supps[-1], 2, 2, count_include_pad=False))
        refs, supps = refs[::-1], supps[::-1]

        def warp(x, flow_nchw):
            n, _, fh, fw = x.shape
            gy, gx = torch.meshgrid(
                torch.arange(fh), torch.arange(fw), indexing="ij"
            )
            grid = torch.stack((gx, gy), 2).float()
            gf = grid + flow_nchw.permute(0, 2, 3, 1)
            gfx = 2.0 * gf[..., 0] / max(fw - 1, 1) - 1.0
            gfy = 2.0 * gf[..., 1] / max(fh - 1, 1) - 1.0
            return F.grid_sample(
                x,
                torch.stack((gfx, gfy), dim=3),
                mode="bilinear",
                padding_mode="border",
                align_corners=True,
            )

        flow = torch.zeros(2, 2, h // 32, w // 32)
        for level in range(6):
            if level == 0:
                flow_up = flow
            else:
                flow_up = (
                    F.interpolate(
                        flow, scale_factor=2, mode="bilinear",
                        align_corners=True,
                    )
                    * 2.0
                )
            inp = torch.cat([refs[level], warp(supps[level], flow_up), flow_up], 1)
            flow = flow_up + head(level, inp)

        want = flow.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=2e-4)
