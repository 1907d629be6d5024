"""Image-quality metrics: PSNR and SSIM (channels-last, jittable).

Native re-implementations of the piqa metrics the reference instantiates from
config (reference conf/train/default.yaml:8-14, src/core/metrics.py:5-41).
Both operate on ``(B, H, W, C)`` frames in [0, 1]; clip inputs of shape
``(B, T, H, W, C)`` are flattened to frames first, mirroring
``compute_metric`` (reference src/core/utils.py:242-247).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np


def _flatten_frames(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B*T, H, W, C); pass 4-D through."""
    if x.ndim == 5:
        b, t, h, w, c = x.shape
        return x.reshape(b * t, h, w, c)
    return x


def psnr(sr: jnp.ndarray, hr: jnp.ndarray, value_range: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio, averaged over the batch (piqa convention:
    per-image MSE over all of C, H, W, then mean of per-image PSNRs)."""
    sr = _flatten_frames(sr).astype(jnp.float32)
    hr = _flatten_frames(hr).astype(jnp.float32)
    mse = jnp.mean((sr - hr) ** 2, axis=(1, 2, 3))
    out = 10.0 * jnp.log10(value_range**2 / jnp.maximum(mse, 1e-12))
    return jnp.mean(out)


def rgb_to_y(x: jnp.ndarray) -> jnp.ndarray:
    """RGB [0,1] → BT.601 limited-range luma channel (matlab ``rgb2ycbcr``
    convention: Y ∈ [16/255, 235/255]).

    The standard VSR evaluation protocol on Vimeo-90K/Vid4 reports
    PSNR/SSIM on this Y channel; the reference's piqa metrics are
    RGB-only, so the Y variants here extend its capability for
    paper-protocol comparisons. Keeps a trailing singleton channel.
    """
    r, g, b = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    return (65.481 * r + 128.553 * g + 24.966 * b + 16.0) / 255.0


def psnr_y(sr: jnp.ndarray, hr: jnp.ndarray) -> jnp.ndarray:
    """PSNR on the BT.601 luma channel (Vimeo/Vid4 protocol)."""
    return psnr(rgb_to_y(_flatten_frames(sr)), rgb_to_y(_flatten_frames(hr)))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _filter2d_valid(x: jnp.ndarray, k1d: np.ndarray) -> jnp.ndarray:
    """Separable valid-mode Gaussian filter on (B, H, W, C) via two matmul-free
    depthwise passes (einsum over sliding windows is avoided; we use
    convolution through jnp.apply of the 1-D kernel along each axis)."""
    k = jnp.asarray(k1d)
    size = k.shape[0]
    # filter rows: (B, H, W, C) -> (B, H-s+1, W, C)
    def conv_axis(arr, axis):
        n = arr.shape[axis]
        out = None
        for i in range(size):
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(i, n - size + 1 + i)
            term = arr[tuple(sl)] * k[i]
            out = term if out is None else out + term
        return out

    return conv_axis(conv_axis(x, 1), 2)


def ssim(
    sr: jnp.ndarray,
    hr: jnp.ndarray,
    value_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Structural similarity (Wang et al.), Gaussian 11x11 sigma 1.5, valid
    padding, per-channel then mean — matching piqa.SSIM defaults."""
    sr = _flatten_frames(sr).astype(jnp.float32)
    hr = _flatten_frames(hr).astype(jnp.float32)
    c1 = (k1 * value_range) ** 2
    c2 = (k2 * value_range) ** 2
    k = _gaussian_kernel(kernel_size, sigma)

    mu_x = _filter2d_valid(sr, k)
    mu_y = _filter2d_valid(hr, k)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _filter2d_valid(sr * sr, k) - mu_xx
    sigma_yy = _filter2d_valid(hr * hr, k) - mu_yy
    sigma_xy = _filter2d_valid(sr * hr, k) - mu_xy

    num = (2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_xx + sigma_yy + c2)
    return jnp.mean(num / den)


def ssim_y(sr: jnp.ndarray, hr: jnp.ndarray) -> jnp.ndarray:
    """SSIM on the BT.601 luma channel (Vimeo/Vid4 protocol)."""
    return ssim(rgb_to_y(_flatten_frames(sr)), rgb_to_y(_flatten_frames(hr)))


class MetricCollection:
    """Named bundle of metric functions (reference src/core/metrics.py:5-41).

    ``metrics`` maps display names to callables ``f(sr, hr) -> scalar``,
    or is a sequence of built-in metric NAMES — the config surface
    (conf/train/default.yaml ``metrics: [PSNR, SSIM]``, mirroring the
    reference's piqa list). Calling the collection returns
    ``{name: float}``; inputs are clamped to [0, 1] and flattened to
    frames, mirroring reference src/core/utils.py:242-247.
    """

    BUILTIN: Dict[str, Callable] = {}  # filled after psnr/ssim below

    def __init__(self, metrics=None, prefix: str | None = None, postfix: str | None = None):
        if metrics is None:
            self.metrics = {"PSNR": psnr, "SSIM": ssim}
        elif isinstance(metrics, dict):
            self.metrics = dict(metrics)
        else:  # sequence of builtin names from config
            try:
                self.metrics = {name: self.BUILTIN[name] for name in metrics}
            except KeyError as e:
                raise ValueError(
                    f"unknown metric {e.args[0]!r}; built-ins: "
                    f"{sorted(self.BUILTIN)}"
                ) from None
        self.prefix = prefix
        self.postfix = postfix

    def _name(self, base: str) -> str:
        name = base if self.prefix is None else self.prefix + base
        return name if self.postfix is None else name + self.postfix

    def __call__(self, sr: jnp.ndarray, hr: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        sr = jnp.clip(sr, 0.0, 1.0)
        hr = jnp.clip(hr, 0.0, 1.0)
        return {self._name(k): m(sr, hr) for k, m in self.metrics.items()}

    def clone(self, prefix: str | None = None, postfix: str | None = None):
        return MetricCollection(self.metrics, prefix or self.prefix, postfix or self.postfix)


MetricCollection.BUILTIN = {
    "PSNR": psnr, "SSIM": ssim, "PSNR_Y": psnr_y, "SSIM_Y": ssim_y,
}


def resolve_metric_names(names) -> tuple:
    """Validate a sequence of builtin metric names up-front (so a config
    typo fails at build time with the list of valid names, not at trace
    time — or minutes into an eval sweep — with a bare KeyError)."""
    if isinstance(names, str):
        # a YAML scalar (`metrics: PSNR`) or bare-string call would
        # otherwise tuple-ize into characters -> "unknown metric 'P'"
        names = (names,)
    names = tuple(names)
    unknown = [n for n in names if n not in MetricCollection.BUILTIN]
    if unknown:
        raise ValueError(
            f"unknown metric(s) {unknown}; built-ins: "
            f"{sorted(MetricCollection.BUILTIN)}"
        )
    return names


def running_metrics(
    acc: Dict[str, float], metric: MetricCollection, sr, hr
) -> Dict[str, float]:
    """Accumulate metric sums across batches (reference src/core/utils.py:249-252)."""
    out = metric(sr, hr)
    return {k: acc[k] + float(out[k]) for k in set(acc) & set(out)}
