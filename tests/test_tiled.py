"""Spatially-tiled inference stitching (evaluation/tiled.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vsrlab_tpu.evaluation import tiled_forward


def _upscale4_pointwise(x):
    """Per-pixel 4x nearest upsample — tile-invariant, so tiled == full
    exactly and any stitching/weighting bug shows up."""
    b, t, h, w, c = x.shape
    y = jnp.repeat(jnp.repeat(x, 4, axis=2), 4, axis=3)
    return y * 2.0 + 1.0


def test_stitching_matches_full(rng):
    lr = jnp.asarray(rng.random((1, 2, 24, 36, 3)), jnp.float32)
    full = _upscale4_pointwise(lr)
    tiled = tiled_forward(_upscale4_pointwise, lr, tile=(16, 16), overlap=8)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full), rtol=1e-6)


def test_single_tile_passthrough(rng):
    lr = jnp.asarray(rng.random((1, 2, 8, 8, 3)), jnp.float32)
    out = tiled_forward(_upscale4_pointwise, lr, tile=(64, 64), overlap=8)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_upscale4_pointwise(lr)), rtol=1e-6
    )


@pytest.mark.slow
def test_model_tiled_shapes(rng):
    from vsrlab_tpu.models import TinyVRT

    import jax

    model = TinyVRT(
        upscale=4, window_size=(2, 4, 4), depths=(2,) * 7,
        embed_dims=(8,) * 7, num_heads=(2,) * 7, deformable_groups=2,
        drop_path_rate=0.0,
    )
    lr = jnp.asarray(rng.random((1, 2, 24, 24, 3)), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), lr)

    def fwd(x):
        sr, _ = model.apply(v, x)
        return sr

    out = tiled_forward(fwd, lr, tile=(16, 16), overlap=8)
    assert out.shape == (1, 2, 96, 96, 3)
    assert np.isfinite(np.asarray(out)).all()
