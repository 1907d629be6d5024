"""Unit tests for the Flax building-block layer (vsrlab_tpu/nn)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsrlab_tpu.nn import (
    ConvLeaky,
    ConvReLU,
    ConvST,
    ConvSTBlock,
    DecoderIDCT,
    EncoderDCT,
    IterativeRefinement,
    MlpMixer,
    PixelShufflePack,
    PixelShufflePack3D,
    ResidualBlock,
    ResidualConv,
    SpectralConv,
)


def init_apply(module, x, **kwargs):
    variables = module.init(jax.random.PRNGKey(0), x, **kwargs)
    return module.apply(variables, x, **kwargs), variables


class TestConvBlocks:
    def test_conv_relu_shape_and_nonneg(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
        y, _ = init_apply(ConvReLU(16, 7, 1, 3), x)
        assert y.shape == (2, 8, 8, 16)
        assert (y >= 0).all()

    def test_conv_leaky(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
        y, _ = init_apply(ConvLeaky(8), x)
        assert y.shape == (2, 8, 8, 8)

    def test_residual_conv_identity_at_zero_weights(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 4)), jnp.float32)
        mod = ResidualConv(4)
        variables = mod.init(jax.random.PRNGKey(0), x)
        zeroed = jax.tree.map(jnp.zeros_like, variables)
        y = mod.apply(zeroed, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))

    def test_residual_block_scan_depth(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 3)), jnp.float32)
        mod = ResidualBlock(8, blocks=5)
        y, variables = init_apply(mod, x)
        assert y.shape == (1, 6, 6, 8)
        # scan stacks the per-block params on a leading axis of length 5
        stacked = variables["params"]["res_blocks"]
        leaf = jax.tree.leaves(stacked)[0]
        assert leaf.shape[0] == 5

    def test_spectral_conv_lipschitz(self, rng):
        """After power iteration the conv's spectral norm should be ~1."""
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
        mod = SpectralConv(8)
        variables = mod.init(jax.random.PRNGKey(0), x)
        state = variables
        for _ in range(50):
            _, updates = mod.apply(
                state, x, update_stats=True, mutable=["batch_stats"]
            )
            state = {**variables, "batch_stats": updates["batch_stats"]}
        y1 = mod.apply(state, x)
        y2 = mod.apply(state, 2.0 * x)
        # linear (no bias): scaling input scales output
        np.testing.assert_allclose(np.asarray(y2), 2 * np.asarray(y1), rtol=1e-5)

    def test_conv_st_shapes(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 3)), jnp.float32)
        y, _ = init_apply(ConvST(16), x)
        assert y.shape == (2, 4, 8, 8, 16)

    def test_conv_st_block(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 3, 8, 8, 3)), jnp.float32)
        y, _ = init_apply(ConvSTBlock(8, blocks=2), x)
        assert y.shape == (1, 3, 8, 8, 8)


class TestUpsampling:
    def test_pixel_shuffle_pack(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
        y, _ = init_apply(PixelShufflePack(16, 2), x)
        assert y.shape == (2, 16, 16, 16)

    def test_pixel_shuffle_pack_3d(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 3, 8, 8, 8)), jnp.float32)
        y, _ = init_apply(PixelShufflePack3D(8, 2), x)
        assert y.shape == (1, 3, 16, 16, 8)


class TestIterativeRefinement:
    def test_residual_refinement(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
        mod = IterativeRefinement(mid_channels=8, blocks=2, steps=3)
        y, variables = init_apply(mod, x)
        assert y.shape == x.shape
        # zero weights -> identity (x += conv(res(x)) with zero conv)
        zeroed = jax.tree.map(jnp.zeros_like, variables)
        y0 = mod.apply(zeroed, x)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(x))


class TestMixerAndDCT:
    def test_mlp_mixer_shape(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 3, 16, 8)), jnp.float32)
        y, _ = init_apply(MlpMixer(patches_dim=16, channels_dim=8, time_dim=3, blocks=2), x)
        assert y.shape == x.shape

    def test_dct_roundtrip(self, rng):
        """DCT basis is orthonormal: decode(encode(x)) == x."""
        x = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 3)), jnp.float32)
        enc = EncoderDCT(ps=4)
        dec = DecoderIDCT(ps=4, h=8, w=8)
        tok = enc(x)
        assert tok.shape == (1, 2, 4, 48)
        rec = dec(tok)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-5)

    def test_dct_matches_torch_grouped_conv(self, rng):
        """Oracle: the reference implements the DCT as a frozen grouped conv."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        from vsrlab_tpu.nn.dct import _dct_basis

        ps = 4
        x = rng.standard_normal((1, 2, 8, 8, 3)).astype(np.float32)
        tok = np.asarray(EncoderDCT(ps)(jnp.asarray(x)))

        basis = torch.from_numpy(_dct_basis(ps)).unsqueeze(1)  # (ps*ps,1,ps,ps)
        weight = torch.cat([basis] * 3, dim=0)
        xt = torch.from_numpy(np.moveaxis(x.reshape(2, 8, 8, 3), -1, 1))
        out = F.conv2d(xt, weight, stride=ps, groups=3)  # (2, 48, 2, 2)
        ref = out.reshape(2, 48, 4).permute(0, 2, 1).numpy()[None]
        np.testing.assert_allclose(tok, ref, atol=1e-5)
