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

    def test_weights_land_in_right_level(self, rng):
        sd = synth_spynet_sd(rng)
        params = load_torch_spynet(sd)
        got = params["basic_module_3"]["conv_2"]["Conv_0"]["kernel"]
        want = sd["basic_module.3.basic_module.4.weight"].transpose(2, 3, 1, 0)
        np.testing.assert_array_equal(got, want)


class TestRealBasicVSRImport:
    def test_structure_matches_init(self, rng):
        mid, blocks, cleaning = 8, 2, 1

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

        params = load_torch_realbasicvsr(sd)
        model = RealBasicVSR(mid_channels=mid, res_blocks=blocks, cleaning_blocks=cleaning)
        lr = jnp.zeros((1, 2, 8, 8, 3))
        init_params = model.init(jax.random.PRNGKey(0), lr)["params"]
        assert tree_shapes(params) == tree_shapes(init_params)

        sr, lq = model.apply({"params": jax.tree.map(jnp.asarray, params)}, lr)
        assert sr.shape == (1, 2, 32, 32, 3)
        assert np.isfinite(np.asarray(sr)).all()
