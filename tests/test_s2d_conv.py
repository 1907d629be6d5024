"""Space-to-depth conv lowering: exactness + SpyNet head integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsrlab_tpu.models.spynet import SpyNetBasicModule
from vsrlab_tpu.ops.s2d_conv import (
    conv_s2d,
    depth_to_space,
    s2d_bias,
    s2d_kernel,
    space_to_depth,
)


def _conv_plain(x, w, p):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(p, p), (p, p)], dimension_numbers=dn
    )


@pytest.mark.parametrize(
    "h,w,ci,co,k", [(16, 20, 8, 32, 7), (6, 10, 3, 5, 7), (12, 12, 16, 2, 7), (8, 8, 4, 6, 5)]
)
def test_s2d_conv_matches_plain(rng, h, w, ci, co, k):
    x = jnp.asarray(rng.standard_normal((2, h, w, ci)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.1, jnp.float32)
    want = _conv_plain(x, wt, k // 2)
    got = depth_to_space(conv_s2d(space_to_depth(x), s2d_kernel(wt)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((3, 8, 12, 5)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x)
    )


def test_s2d_bias_order(rng):
    """Bias layout must match the s2d output channel order (phase-major)."""
    b = jnp.arange(3.0)
    x = jnp.zeros((1, 4, 4, 2), jnp.float32)
    wt = jnp.zeros((7, 7, 2, 3), jnp.float32)
    y = depth_to_space(conv_s2d(space_to_depth(x), s2d_kernel(wt)) + s2d_bias(b))
    np.testing.assert_allclose(np.asarray(y), np.broadcast_to(np.arange(3.0), (1, 4, 4, 3)))


class TestSpyNetHead:
    def test_s2d_head_matches_plain(self, rng):
        """The default s2d head must equal the plain-conv head exactly
        (same params, fp32)."""
        x = jnp.asarray(rng.standard_normal((2, 12, 16, 8)), jnp.float32)
        head_s2d = SpyNetBasicModule()
        head_plain = SpyNetBasicModule(use_s2d=False)
        variables = head_s2d.init(jax.random.PRNGKey(0), x)
        a = head_s2d.apply(variables, x)
        b = head_plain.apply(variables, x)  # same tree
        assert a.shape == b.shape == (2, 12, 16, 2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_odd_sizes_fall_back(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 3, 5, 8)), jnp.float32)
        head = SpyNetBasicModule()
        variables = head.init(jax.random.PRNGKey(0), x)
        y = head.apply(variables, x)
        assert y.shape == (2, 3, 5, 2)

    def test_param_tree_unchanged(self):
        """Checkpoint/importer compatibility: conv_i/Conv_0/{kernel,bias}."""
        x = jnp.zeros((1, 8, 8, 8), jnp.float32)
        variables = SpyNetBasicModule().init(jax.random.PRNGKey(0), x)
        p = variables["params"]
        assert set(p.keys()) == {f"conv_{i}" for i in range(5)}
        assert set(p["conv_0"].keys()) == {"Conv_0"}
        assert p["conv_0"]["Conv_0"]["kernel"].shape == (7, 7, 8, 32)
        assert p["conv_4"]["Conv_0"]["kernel"].shape == (7, 7, 16, 2)
