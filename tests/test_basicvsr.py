"""BasicVSR / RealBasicVSR / UNetDiscriminator model tests."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from vsrlab_tpu.models import BasicVSR, RealBasicVSR, UNetDiscriminator


def tiny_basicvsr(**kw):
    return BasicVSR(mid_channels=8, res_blocks=1, upscale=4, **kw)


class TestBasicVSR:
    def test_output_shape(self, rng):
        model = tiny_basicvsr()
        lrs = jnp.asarray(rng.random((2, 5, 16, 16, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), lrs)
        sr = model.apply(variables, lrs)
        assert sr.shape == (2, 5, 64, 64, 3)
        assert np.isfinite(np.asarray(sr)).all()

    @pytest.mark.slow  # default tier: test_output_shape covers the x4 default
    def test_upscale_2(self, rng):
        model = BasicVSR(mid_channels=8, res_blocks=1, upscale=2)
        lrs = jnp.asarray(rng.random((1, 3, 16, 16, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), lrs)
        sr = model.apply(variables, lrs)
        assert sr.shape == (1, 3, 32, 32, 3)

    @pytest.mark.slow  # default tier: the torch full-forward oracle pins
    # the residual path end-to-end
    def test_residual_path_at_zero_weights(self, rng):
        """With all weights zero the output is exactly the bilinear base."""
        from vsrlab_tpu.ops.resize import resize_bilinear

        model = tiny_basicvsr()
        lrs = jnp.asarray(rng.random((1, 3, 8, 8, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), lrs)
        zeroed = jax.tree.map(jnp.zeros_like, variables)
        sr = model.apply(zeroed, lrs)
        base = resize_bilinear(
            lrs.reshape(3, 8, 8, 3), (32, 32), align_corners=False
        ).reshape(1, 3, 32, 32, 3)
        np.testing.assert_allclose(np.asarray(sr), np.asarray(base), atol=1e-6)

    @pytest.mark.slow  # training semantic also exercised by trainer e2e (slow)
    def test_frozen_flow_gets_no_grad(self, rng):
        """train_flow=False must stop gradients into SpyNet params
        (reference freezes them via requires_grad=False, basicvsr.py:25-28)."""
        model = tiny_basicvsr(train_flow=False)
        lrs = jnp.asarray(rng.random((1, 3, 16, 16, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), lrs)

        def loss_fn(params):
            sr = model.apply({"params": params}, lrs)
            return jnp.mean(sr**2)

        grads = jax.grad(loss_fn)(variables["params"])
        spynet_norm = sum(
            float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["spynet"])
        )
        other_norm = sum(
            float(jnp.abs(g).sum())
            for k, v in grads.items()
            if k != "spynet"
            for g in jax.tree.leaves(v)
        )
        assert spynet_norm == 0.0
        assert other_norm > 0.0

    @pytest.mark.slow  # default tier: the torch full-forward oracle pins
    # the default (auto-unroll) path; scan-vs-unroll equality is a
    # structural invariant that rarely regresses alone
    def test_time_unroll_matches_scan(self, rng):
        """time_unroll fully unrolls the recurrence time-scan; outputs
        must match the scanned form (same params — unrolling changes
        loop structure, not math)."""
        lrs = jnp.asarray(rng.random((1, 10, 8, 8, 3)), jnp.float32)
        scanned = tiny_basicvsr()  # T=10 > 8: auto keeps the scan
        unrolled = tiny_basicvsr(time_unroll=10)
        variables = scanned.init(jax.random.PRNGKey(0), lrs)
        a = np.asarray(jax.jit(scanned.apply)(variables, lrs))
        b = np.asarray(jax.jit(unrolled.apply)(variables, lrs))
        np.testing.assert_allclose(a, b, atol=1e-6)

    @pytest.mark.slow  # default tier: torch full-forward oracle pins recurrence
    def test_temporal_propagation_reaches_all_frames(self, rng):
        """Perturbing the middle frame must change every output frame
        (bidirectional recurrence carries information both ways)."""
        model = tiny_basicvsr()
        lrs = jnp.asarray(rng.random((1, 5, 8, 8, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), lrs)
        sr1 = np.asarray(model.apply(variables, lrs))
        lrs2 = lrs.at[:, 2].add(0.1)
        sr2 = np.asarray(model.apply(variables, lrs2))
        per_frame_delta = np.abs(sr1 - sr2).reshape(5, -1).max(axis=1)
        assert (per_frame_delta > 1e-6).all()


class TestRealBasicVSR:
    def test_returns_sr_and_cleaned(self, rng):
        model = RealBasicVSR(
            mid_channels=8, res_blocks=1, cleaning_blocks=1, upscale=4
        )
        lr = jnp.asarray(rng.random((1, 3, 16, 16, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), lr)
        sr, lq = model.apply(variables, lr)
        assert sr.shape == (1, 3, 64, 64, 3)
        assert lq.shape == lr.shape

    def test_frame_pack_matches_plain(self, rng):
        """Cleaner frame packing (C=64→128 MXU lanes, block-diagonal
        weights — docs/tpu_kernel_notes.md round-5): per-frame numerics
        are EXACT vs the plain path, init is flag-independent, an odd
        frame count falls back, and gradients flow to the same logical
        tree."""
        kw = dict(mid_channels=8, res_blocks=1, cleaning_blocks=1)
        plain = RealBasicVSR(**kw, frame_pack=False)
        packed = RealBasicVSR(**kw, frame_pack=True)
        lr = jnp.asarray(rng.random((1, 4, 16, 16, 3)), jnp.float32)
        v = jax.jit(plain.init)(jax.random.PRNGKey(0), lr)
        v2 = jax.jit(packed.init)(jax.random.PRNGKey(0), lr)
        for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        sr0, lq0 = jax.jit(plain.apply)(v, lr)
        sr1, lq1 = jax.jit(packed.apply)(v, lr)
        np.testing.assert_array_equal(np.asarray(lq0), np.asarray(lq1))
        np.testing.assert_allclose(
            np.asarray(sr0), np.asarray(sr1), atol=1e-6)

        # odd frame count: falls back to the plain path, same output
        sr3, _ = jax.jit(packed.apply)(v, lr[:, :3])
        sr3p, _ = jax.jit(plain.apply)(v, lr[:, :3])
        np.testing.assert_array_equal(np.asarray(sr3), np.asarray(sr3p))

        # gradients reach the logical cleaner tree through the packing
        def loss(p):
            sr, lq = packed.apply({"params": p}, lr)
            return jnp.mean(sr**2) + jnp.mean(lq**2)

        g = jax.jit(jax.grad(loss))(v["params"])
        cleaner_leaves = jax.tree.leaves(g["cleaner"])
        assert all(np.isfinite(np.asarray(l)).all() for l in cleaner_leaves)
        assert any(float(jnp.max(jnp.abs(l))) > 0 for l in cleaner_leaves)


class TestUNetDiscriminator:
    @pytest.mark.slow  # default tier: test_gan.py's GanStep tests run the
    # discriminator fwd+bwd inside the jitted GAN step (pixel-wise loss
    # requires the per-pixel logit map this test pins)
    def test_per_pixel_logits(self, rng):
        model = UNetDiscriminator(mid_channels=8)
        img = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), img)
        logits = model.apply(variables, img)
        assert logits.shape == (2, 32, 32, 1)

    def test_spectral_stats_update(self, rng):
        model = UNetDiscriminator(mid_channels=8)
        img = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), img)
        _, updates = model.apply(
            variables, img, update_stats=True, mutable=["batch_stats"]
        )
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(updates["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )
