"""Mixed-precision quality and determinism checks.

The bench runs bf16; the acceptance bar (BASELINE.md) is PSNR parity
within 0.05 dB, so the bf16 pipeline must not measurably degrade output
quality relative to fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsrlab_tpu.core.metrics import psnr
from vsrlab_tpu.data.datasets import SyntheticVSR
from vsrlab_tpu.models import RealBasicVSR


class TestPrecision:
    @pytest.mark.slow
    def test_bf16_psnr_within_tolerance(self, rng):
        """bf16 inference PSNR (vs HR) within 0.05 dB of fp32 inference."""
        ds = SyntheticVSR(num_videos=2, seq=4, height=32, width=32, scale=4)
        lr = jnp.asarray(np.stack([ds[i][0] for i in range(2)]))
        hr = jnp.asarray(np.stack([ds[i][1] for i in range(2)]))

        kw = dict(mid_channels=16, res_blocks=2, cleaning_blocks=1)
        m32 = RealBasicVSR(**kw)
        m16 = RealBasicVSR(**kw, dtype=jnp.bfloat16)
        variables = jax.jit(m32.init)(jax.random.PRNGKey(0), lr)

        sr32, _ = m32.apply(variables, lr)
        sr16, _ = m16.apply(variables, lr)
        p32 = float(psnr(jnp.clip(sr32, 0, 1), hr))
        p16 = float(psnr(jnp.clip(sr16.astype(jnp.float32), 0, 1), hr))
        assert abs(p32 - p16) < 0.05, (p32, p16)

    def test_inference_deterministic(self, rng):
        """Two identical jitted forwards produce identical bits."""
        lr = jnp.asarray(rng.random((1, 3, 16, 16, 3)), jnp.float32)
        model = RealBasicVSR(mid_channels=8, res_blocks=1, cleaning_blocks=1)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), lr)
        f = jax.jit(lambda v, x: model.apply(v, x)[0])
        a = np.asarray(f(variables, lr))
        b = np.asarray(f(variables, lr))
        np.testing.assert_array_equal(a, b)
