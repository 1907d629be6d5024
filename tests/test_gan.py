"""GAN training stack tests: perceptual loss, adversarial loss, gan step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vsrlab_tpu.core.losses import adversarial_loss
from vsrlab_tpu.core.perceptual import (
    LAYER_WEIGHTS,
    PerceptualLoss,
    VGG19Features,
    load_torch_vgg19,
)
from vsrlab_tpu.models import RealBasicVSR, UNetDiscriminator
from vsrlab_tpu.train.gan import make_gan_train_step
from vsrlab_tpu.train.state import create_train_state


class TestPerceptual:
    def test_feature_taps_shapes(self, rng):
        x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
        model = VGG19Features()
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        taps = model.apply(variables, x)
        assert set(taps.keys()) == set(LAYER_WEIGHTS.keys())
        assert taps[2].shape == (1, 64, 64, 64)     # conv1_2, full res
        assert taps[7].shape == (1, 32, 32, 128)    # conv2_2, 1/2
        assert taps[16].shape == (1, 16, 16, 256)   # conv3_4, 1/4
        assert taps[25].shape == (1, 8, 8, 512)     # conv4_4, 1/8
        assert taps[34].shape == (1, 4, 4, 512)     # conv5_4, 1/16

    def test_vgg_matches_torchvision_architecture(self, rng):
        """Load torch-initialised VGG19 weights and compare tap outputs."""
        torch = pytest.importorskip("torch")
        import torch.nn as tnn

        # build torchvision-layout features trunk with random weights
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
               512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
        layers, in_ch = [], 3
        torch.manual_seed(0)
        for v in cfg:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
                layers.append(tnn.ReLU())
                in_ch = v
        feats = tnn.Sequential(*layers)

        params = load_torch_vgg19(feats.state_dict())
        model = VGG19Features(tap_layers=(2, 7))
        x_np = rng.random((1, 32, 32, 3)).astype(np.float32)
        taps = model.apply({"params": params}, jnp.asarray(x_np))

        # the reference's EFFECTIVE tap semantics (losses.py:38-44 with
        # torchvision's ReLU(inplace=True)): a stored tap is mutated by
        # the following in-place ReLU, so non-deepest taps are post-ReLU;
        # the deepest tap has its ReLU cut off by features[:deepest+1]
        xt = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        outs = {}
        h = xt
        for i, m in enumerate(feats):
            h = m(h)
            if i == 2:
                outs[i] = torch.relu(h).detach().numpy().transpose(0, 2, 3, 1)
            if i == 7:
                outs[i] = h.detach().numpy().transpose(0, 2, 3, 1)
                break
        np.testing.assert_allclose(np.asarray(taps[2]), outs[2], atol=1e-4)
        np.testing.assert_allclose(np.asarray(taps[7]), outs[7], atol=1e-4)

    def test_perceptual_loss_zero_at_identity(self, rng):
        x = jnp.asarray(rng.random((1, 2, 32, 32, 3)), jnp.float32)
        loss = PerceptualLoss(weight=1.0)
        assert float(loss(x, x)) == 0.0
        y = x + 0.1
        assert float(loss(y, x)) > 0.0


class TestAdversarial:
    def test_weighting_semantics(self, rng):
        """is_disc=True ignores the weight (reference losses.py:66-74)."""
        logits = jnp.asarray(rng.standard_normal((4, 8, 8, 1)), jnp.float32)
        g = adversarial_loss(logits, 1.0, is_disc=False, weight=2e-5)
        d = adversarial_loss(logits, 1.0, is_disc=True, weight=2e-5)
        np.testing.assert_allclose(float(g), float(d) * 2e-5, rtol=1e-6)


class TestGanStep:
    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.default_rng(0)
        model = RealBasicVSR(mid_channels=8, res_blocks=1, cleaning_blocks=1)
        disc = UNetDiscriminator(mid_channels=8)
        lr = jnp.asarray(rng.random((1, 2, 8, 8, 3)), jnp.float32)
        hr = jnp.asarray(rng.random((1, 2, 32, 32, 3)), jnp.float32)
        g_state = create_train_state(
            model, jax.random.PRNGKey(0), lr, optax.adam(1e-4)
        )
        d_state = create_train_state(
            disc, jax.random.PRNGKey(1), hr[:, 0], optax.adam(1e-4)
        )
        return model, disc, g_state, d_state, {"lr": lr, "hr": hr}

    def test_updates_both_networks(self, setup):
        model, disc, g_state, d_state, batch = setup
        step = make_gan_train_step(model, disc, None, update_generator=True, donate=False)
        g2, d2, metrics = step(g_state, d_state, batch)
        assert float(metrics["LossDiscriminator"]) > 0
        g_changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(g_state.params), jax.tree.leaves(g2.params))
        )
        d_changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(d_state.params), jax.tree.leaves(d2.params))
        )
        assert g_changed and d_changed

    def test_generator_freeze(self, setup):
        model, disc, g_state, d_state, batch = setup
        step = make_gan_train_step(model, disc, None, update_generator=False, donate=False)
        g2, d2, _ = step(g_state, d_state, batch)
        for a, b in zip(
            jax.tree.leaves(g_state.params), jax.tree.leaves(g2.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_spectral_norm_stats_updated(self, setup):
        model, disc, g_state, d_state, batch = setup
        step = make_gan_train_step(model, disc, None, update_generator=True, donate=False)
        _, d2, _ = step(g_state, d_state, batch)
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(d_state.batch_stats),
                jax.tree.leaves(d2.batch_stats),
            )
        )
        assert changed
