"""Fused residual conv-pair Pallas kernel vs XLA oracle (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vsrlab_tpu.ops.pallas_conv import (
    residual_conv_pair,
    residual_conv_pair_im2col,
    residual_conv_pair_xla,
)


@pytest.mark.parametrize(
    "shape,block_rows",
    [
        ((1, 24, 16, 8), 12),   # multiple row blocks
        ((2, 12, 20, 8), 4),    # batch grid + odd width
        ((1, 12, 12, 64), 12),  # production channel width, single block
    ],
)
def test_residual_conv_pair_matches_xla(rng, shape, block_rows):
    _, _, _, c = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((c,)), jnp.float32)

    want = residual_conv_pair_xla(x, w1, b1, w2, b2)
    got = residual_conv_pair(
        x, w1, b1, w2, b2, block_rows=block_rows, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
    got2 = residual_conv_pair_im2col(
        x, w1, b1, w2, b2, block_rows=block_rows, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_residual_conv_pair_bf16(rng):
    """bf16 in/out with fp32 accumulation, like the production chain."""
    shape, c = (1, 24, 16, 8), 8
    x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((c,)), jnp.float32)

    want = residual_conv_pair_xla(x, w1, b1, w2, b2)
    got = residual_conv_pair(x, w1, b1, w2, b2, block_rows=12, interpret=True)
    # one bf16 rounding difference is allowed at the final residual add
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )
