"""VGG19 perceptual loss (Flax).

Capability parity with the reference ``PerceptualVGG``/``PerceptualLoss``
(src/core/losses.py:29-64): L1 between VGG19 feature maps of prediction
and target at torchvision ``features`` indices {2, 7, 16, 25, 34}
(conv1_2 … conv5_4, pre-ReLU) with layer weights
{0.1, 0.1, 0.8, 0.9, 1.0}, summed and scaled.

The box has no torchvision VGG19 weights and no egress; the extractor
initialises randomly (He) and :func:`load_torch_vgg19` imports a
torchvision ``state_dict`` when one is available. A randomly-initialised
deep CNN is still a usable perceptual metric (random-VGG losses are an
established baseline) and the wiring/weights-import path is exact.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

# torchvision vgg19.features conv layout: (module index, out channels);
# 'M' = 2x2 max pool
VGG19_FEATURES: List = [
    (0, 64), (2, 64), "M",
    (5, 128), (7, 128), "M",
    (10, 256), (12, 256), (14, 256), (16, 256), "M",
    (19, 512), (21, 512), (23, 512), (25, 512), "M",
    (28, 512), (30, 512), (32, 512), (34, 512), "M",
]

LAYER_WEIGHTS = {2: 0.1, 7: 0.1, 16: 0.8, 25: 0.9, 34: 1.0}


class VGG19Features(nn.Module):
    """VGG19 ``features`` trunk up to the deepest tap layer; returns the
    conv outputs at ``tap_layers`` with the REFERENCE'S effective
    activation semantics (PerceptualVGG forward, losses.py:38-44): the
    stored tensors are mutated by torchvision's ``ReLU(inplace=True)``
    modules that follow each conv, so every tap is effectively POST-ReLU
    — except the deepest (34), whose following ReLU (module 35) is cut
    off by ``features[:35]`` and therefore stays pre-ReLU. Torch-oracle
    pinned at nontrivial weights in tests/test_perceptual_golden.py."""

    tap_layers: Sequence[int] = tuple(LAYER_WEIGHTS.keys())
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x) -> Dict[int, jnp.ndarray]:
        taps: Dict[int, jnp.ndarray] = {}
        deepest = max(self.tap_layers)
        for item in VGG19_FEATURES:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            idx, ch = item
            if idx > deepest:
                break
            x = nn.Conv(
                ch, (3, 3), padding=[(1, 1)] * 2,
                kernel_init=jax.nn.initializers.he_normal(),
                dtype=self.dtype,
                name=f"conv_{idx}",
            )(x)
            if idx == deepest:
                taps[idx] = x  # no ReLU executes after the cut-off
                break
            x = nn.relu(x)
            if idx in self.tap_layers:
                taps[idx] = x  # post-ReLU: the in-place mutation semantics
        return taps


class PerceptualLoss:
    """Stateful wrapper: holds frozen VGG params, computes the weighted
    multi-layer L1 (reference PerceptualLoss, losses.py:46-64).

    Frames in [0, 1]; clips ``(B, T, H, W, 3)`` are flattened to frames.
    """

    def __init__(
        self,
        weight: float = 1e-2,
        layer_weights: Dict[int, float] | None = None,
        params=None,
        rng: int = 0,
        dtype: Dtype = None,
    ):
        self.weight = float(weight)
        self.layer_weights = dict(layer_weights or LAYER_WEIGHTS)
        self.model = VGG19Features(
            tuple(self.layer_weights.keys()), dtype=dtype
        )
        if params is None:
            dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
            params = jax.jit(self.model.init)(jax.random.PRNGKey(rng), dummy)[
                "params"
            ]
        self.params = jax.lax.stop_gradient(params)

    def __call__(self, yhat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        if yhat.ndim == 5:
            yhat = yhat.reshape((-1,) + yhat.shape[2:])
            y = y.reshape((-1,) + y.shape[2:])
        f_pred = self.model.apply({"params": self.params}, yhat)
        f_gt = self.model.apply(
            {"params": self.params}, jax.lax.stop_gradient(y)
        )
        loss = 0.0
        for k, w in self.layer_weights.items():
            loss = loss + w * jnp.mean(
                jnp.abs(f_pred[k].astype(jnp.float32) - f_gt[k].astype(jnp.float32))
            )
        return loss * self.weight


def load_torch_vgg19(state_dict) -> dict:
    """Convert a torchvision ``vgg19().features`` state_dict (or full
    vgg19 state_dict with ``features.`` prefixes) to flax params for
    :class:`VGG19Features`."""
    params = {}
    for item in VGG19_FEATURES:
        if item == "M":
            continue
        idx, _ = item
        for key in (f"features.{idx}.weight", f"{idx}.weight"):
            if key in state_dict:
                w = np.asarray(state_dict[key])  # (out, in, kh, kw)
                b = np.asarray(state_dict[key.replace("weight", "bias")])
                params[f"conv_{idx}"] = {
                    "kernel": w.transpose(2, 3, 1, 0),
                    "bias": b,
                }
                break
    return params
