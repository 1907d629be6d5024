"""Torch checkpoint importer tests: synthetic reference-layout state
dicts must convert to exactly our models' param trees."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsrlab_tpu.core.torch_import import (
    load_torch_realbasicvsr,
    load_torch_spynet,
)
from vsrlab_tpu.models import RealBasicVSR, SpyNet


def tree_shapes(p, prefix=""):
    out = {}
    for k, v in sorted(p.items()):
        if isinstance(v, dict):
            out.update(tree_shapes(v, prefix + k + "/"))
        else:
            out[prefix + k] = tuple(np.asarray(v).shape)
    return out


def synth_spynet_sd(rng, prefix=""):
    """Reference VRT-variant SpyNet state dict with random weights."""
    sd = {}
    chans = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]
    for i in range(6):
        for j, (ci, co) in enumerate(chans):
            key = f"{prefix}basic_module.{i}.basic_module.{2 * j}"
            sd[f"{key}.weight"] = rng.standard_normal((co, ci, 7, 7)).astype(np.float32)
            sd[f"{key}.bias"] = rng.standard_normal(co).astype(np.float32)
    return sd


class TestSpyNetImport:
    def test_structure_and_forward(self, rng):
        sd = synth_spynet_sd(rng)
        params = load_torch_spynet(sd)

        model = SpyNet()
        ref = jnp.zeros((1, 64, 64, 3))
        init_params = model.init(jax.random.PRNGKey(0), ref, ref)["params"]
        assert tree_shapes(params) == tree_shapes(init_params)

        flow = model.apply({"params": params}, ref, ref)
        assert flow.shape == (1, 64, 64, 2)
        assert np.isfinite(np.asarray(flow)).all()

    def test_params_prefix_stripped(self, rng):
        sd = synth_spynet_sd(rng, prefix="params.")
        params = load_torch_spynet(sd)
        assert "basic_module_0" in params

    def test_mmedit_sintel_layout(self, rng):
        """The raw spynet-sintel checkpoint layout
        (``basic_module.{i}.basic_module.{j}.conv.*``) — the form the
        reference positionally remaps (RealBasicVSR/modules/spynet.py:36)
        — imports directly."""
        chans = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]
        sd = {}
        for i in range(6):
            for j, (ci, co) in enumerate(chans):
                key = f"basic_module.{i}.basic_module.{j}.conv"
                sd[f"{key}.weight"] = rng.standard_normal(
                    (co, ci, 7, 7)
                ).astype(np.float32)
                sd[f"{key}.bias"] = rng.standard_normal(co).astype(np.float32)
        params = load_torch_spynet(sd)
        ref_sd = synth_spynet_sd(rng)
        assert tree_shapes(params) == tree_shapes(load_torch_spynet(ref_sd))
        got = params["basic_module_2"]["conv_1"]["Conv_0"]["kernel"]
        want = sd["basic_module.2.basic_module.1.conv.weight"].transpose(2, 3, 1, 0)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_unknown_layout_raises(self):
        with pytest.raises(ValueError, match="unrecognised SpyNet"):
            load_torch_spynet({"something.weird": np.zeros((2, 2))})

    def test_weights_land_in_right_level(self, rng):
        sd = synth_spynet_sd(rng)
        params = load_torch_spynet(sd)
        got = params["basic_module_3"]["conv_2"]["Conv_0"]["kernel"]
        want = sd["basic_module.3.basic_module.4.weight"].transpose(2, 3, 1, 0)
        np.testing.assert_array_equal(got, want)


def synth_realbasicvsr_sd(rng, mid=8, blocks=2, cleaning=1):
    """Reference-layout RealBasicVSR state dict with random weights
    (shared with tests/test_acceptance.py)."""

    def rb(prefix, cin, cout, n):
        sd = {}
        sd[f"{prefix}.conv.0.weight"] = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
        sd[f"{prefix}.conv.0.bias"] = rng.standard_normal(cout).astype(np.float32)
        for i in range(n):
            for c in ("conv1", "conv2"):
                sd[f"{prefix}.res_block.{i}.{c}.weight"] = rng.standard_normal(
                    (cout, cout, 3, 3)
                ).astype(np.float32)
                sd[f"{prefix}.res_block.{i}.{c}.bias"] = rng.standard_normal(cout).astype(np.float32)
        return sd

    sd = {}
    sd.update(rb("cleaner.resblock", 3, mid, cleaning))
    sd["cleaner.conv.weight"] = rng.standard_normal((3, mid, 3, 3)).astype(np.float32)
    sd["cleaner.conv.bias"] = rng.standard_normal(3).astype(np.float32)
    sd.update(rb("basicvsr.backward_resblocks", mid + 3, mid, blocks))
    sd.update(rb("basicvsr.forward_resblocks", mid + 3, mid, blocks))
    sd["basicvsr.point_conv.0.weight"] = rng.standard_normal((mid, 2 * mid, 1, 1)).astype(np.float32)
    sd["basicvsr.point_conv.0.bias"] = rng.standard_normal(mid).astype(np.float32)
    for i in range(2):
        sd[f"basicvsr.upsample.{i}.upconv.weight"] = rng.standard_normal(
            (mid * 4, mid, 3, 3)
        ).astype(np.float32)
        sd[f"basicvsr.upsample.{i}.upconv.bias"] = rng.standard_normal(mid * 4).astype(np.float32)
    sd["basicvsr.conv_last.0.weight"] = rng.standard_normal((64, mid, 3, 3)).astype(np.float32)
    sd["basicvsr.conv_last.0.bias"] = rng.standard_normal(64).astype(np.float32)
    sd["basicvsr.conv_last.2.weight"] = rng.standard_normal((3, 64, 3, 3)).astype(np.float32)
    sd["basicvsr.conv_last.2.bias"] = rng.standard_normal(3).astype(np.float32)
    sd.update(synth_spynet_sd(rng, prefix="basicvsr.spynet."))
    return sd


class TestRealBasicVSRImport:
    def test_structure_matches_init(self, rng):
        mid, blocks, cleaning = 8, 2, 1
        sd = synth_realbasicvsr_sd(rng, mid, blocks, cleaning)

        params = load_torch_realbasicvsr(sd)
        model = RealBasicVSR(mid_channels=mid, res_blocks=blocks, cleaning_blocks=cleaning)
        lr = jnp.zeros((1, 2, 8, 8, 3))
        init_params = model.init(jax.random.PRNGKey(0), lr)["params"]
        assert tree_shapes(params) == tree_shapes(init_params)

        sr, lq = model.apply({"params": jax.tree.map(jnp.asarray, params)}, lr)
        assert sr.shape == (1, 2, 32, 32, 3)
        assert np.isfinite(np.asarray(sr)).all()


class TestVRTImport:
    @pytest.mark.slow
    def test_structure_matches_init(self, rng):
        """Synthesize a reference-layout TinyVRT state dict and convert."""
        from vsrlab_tpu.core.torch_import import load_torch_vrt
        from vsrlab_tpu.models import TinyVRT

        dims = (8,) * 7
        depths = (2,) * 7
        heads = (2,) * 7
        ws = (2, 4, 4)
        dg = 2
        model = TinyVRT(
            upscale=4, window_size=ws, depths=depths, embed_dims=dims,
            num_heads=heads, deformable_groups=dg, drop_path_rate=0.0,
        )

        sd = {}

        def conv2(key, cin, cout, k=3):
            sd[f"{key}.weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32)
            sd[f"{key}.bias"] = rng.standard_normal(cout).astype(np.float32)

        def conv3(key, cin, cout):
            sd[f"{key}.weight"] = rng.standard_normal((cout, cin, 1, 3, 3)).astype(np.float32)
            sd[f"{key}.bias"] = rng.standard_normal(cout).astype(np.float32)

        def lin(key, cin, cout):
            sd[f"{key}.weight"] = rng.standard_normal((cout, cin)).astype(np.float32)
            sd[f"{key}.bias"] = rng.standard_normal(cout).astype(np.float32)

        def ln(key, c):
            sd[f"{key}.weight"] = rng.standard_normal(c).astype(np.float32)
            sd[f"{key}.bias"] = rng.standard_normal(c).astype(np.float32)

        def tmsa(prefix, dim, wsz, mut):
            ln(f"{prefix}.norm1", dim)
            ln(f"{prefix}.norm2", dim)
            nrel = (2 * wsz[0] - 1) * (2 * wsz[1] - 1) * (2 * wsz[2] - 1)
            sd[f"{prefix}.attn.relative_position_bias_table"] = rng.standard_normal(
                (nrel, 2)
            ).astype(np.float32)
            lin(f"{prefix}.attn.qkv_self", dim, 3 * dim)
            lin(f"{prefix}.attn.proj", 2 * dim if mut else dim, dim)
            if mut:
                lin(f"{prefix}.attn.qkv_mut", dim, 3 * dim)
            lin(f"{prefix}.mlp.fc11", dim, 2 * dim)
            lin(f"{prefix}.mlp.fc12", dim, 2 * dim)
            lin(f"{prefix}.mlp.fc2", 2 * dim, dim)

        def tmsag(prefix, dim, depth, wsz, mut):
            for j in range(depth):
                tmsa(f"{prefix}.blocks.{j}", dim, wsz, mut)

        reshapes = ("none", "down", "down", "up", "up")
        for i, rs in enumerate(reshapes, start=1):
            d = dims[i - 1]
            prev = dims[i - 2]
            if rs == "none":
                ln(f"stage{i}.reshape.1", d)
            elif rs == "down":
                ln(f"stage{i}.reshape.1", 4 * prev)
                lin(f"stage{i}.reshape.2", 4 * prev, d)
            else:
                ln(f"stage{i}.reshape.1", prev // 4)
                lin(f"stage{i}.reshape.2", prev // 4, d)
            d1 = int(depths[i - 1] * 0.75)
            tmsag(f"stage{i}.residual_group1", d, d1, (2, ws[1], ws[2]), True)
            tmsag(f"stage{i}.residual_group2", d, depths[i - 1] - d1, ws, False)
            lin(f"stage{i}.linear1", d, d)
            lin(f"stage{i}.linear2", d, d)
            # pa_deform
            conv2(f"stage{i}.pa_deform.conv_offset.0", 2 * d + 2, d)
            conv2(f"stage{i}.pa_deform.conv_offset.2", d, d)
            conv2(f"stage{i}.pa_deform.conv_offset.4", d, d)
            conv2(f"stage{i}.pa_deform.conv_offset.6", d, 3 * 9 * dg)
            conv2(f"stage{i}.pa_deform", d, d)
            lin(f"stage{i}.pa_fuse.fc11", 3 * d, 3 * d)
            lin(f"stage{i}.pa_fuse.fc12", 3 * d, 3 * d)
            lin(f"stage{i}.pa_fuse.fc2", 3 * d, d)

        # trunk = stage6 for TinyVRT
        ln("stage6.0.1", dims[4])
        lin("stage6.0.2", dims[4], dims[5])
        for k, i in ((1, 5), (2, 6)):
            wsz = (1, ws[1], ws[2])  # indep_reconsts (-2, -1)
            tmsag(f"stage6.{k}.residual_group", dims[i], depths[i], wsz, False)
            lin(f"stage6.{k}.linear", dims[i], dims[i])

        ln("norm", dims[-1])
        lin("conv_after_body", dims[-1], dims[0])
        conv3("conv_first", 27, dims[0])
        conv3("conv_before_upsample.0", dims[0], 64)
        conv3("upsample.0", 64, 256)
        conv3("upsample.5", 64, 256)
        conv3("upsample.10", 64, 64)
        conv3("conv_last", 64, 3)
        sd.update(synth_spynet_sd(rng, prefix="optical_flow."))

        params = load_torch_vrt(sd, n_scale_stages=5)
        x = jnp.zeros((1, 2, 16, 16, 3))
        init_params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
        assert tree_shapes(params) == tree_shapes(init_params)

        sr, lq = model.apply({"params": jax.tree.map(jnp.asarray, params)}, x)
        assert sr.shape == (1, 2, 64, 64, 3)
        assert np.isfinite(np.asarray(sr)).all()
