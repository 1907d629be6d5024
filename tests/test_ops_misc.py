"""pixel_shuffle / avg_pool / deform_conv / correlation vs oracles."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from conftest import to_nchw, to_nhwc
from vsrlab_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from vsrlab_tpu.ops.pooling import avg_pool2d
from vsrlab_tpu.ops.deform import deform_conv2d
from vsrlab_tpu.ops.correlation import (
    all_pairs_correlation,
    cost_volume,
    spatial_correlation_sample,
)


@pytest.mark.parametrize("r", [2, 3])
def test_pixel_shuffle_matches_torch(rng, r):
    x = rng.standard_normal((2, 4, 5, 6 * r * r)).astype(np.float32)
    got = np.asarray(pixel_shuffle(x, r))
    want = to_nhwc(torch.pixel_shuffle(torch.from_numpy(to_nchw(x)), r).numpy())
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_pixel_unshuffle_roundtrip(rng):
    x = rng.standard_normal((2, 6, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(pixel_shuffle(pixel_unshuffle(x, 2), 2)), x)


@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (2, 9, 11, 3)])
def test_avg_pool2d_matches_torch(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    got = np.asarray(avg_pool2d(x, 2, 2))
    want = to_nhwc(
        F.avg_pool2d(torch.from_numpy(to_nchw(x)), 2, 2, count_include_pad=False).numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def _deform_conv_reference(x, offset, weight, bias, stride, padding, dilation, mask):
    """Slow numpy loop oracle for torchvision deform_conv2d semantics."""
    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    taps = kh * kw
    groups = offset.shape[-1] // (2 * taps)
    cg = cin // groups
    ho, wo = offset.shape[1], offset.shape[2]
    out = np.zeros((n, ho, wo, cout), np.float64)

    def sample(img2d, py, px):
        hh, ww = img2d.shape
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        val = 0.0
        for (yy, wy) in [(y0, 1 - (py - y0)), (y0 + 1, py - y0)]:
            for (xx, wx) in [(x0, 1 - (px - x0)), (x0 + 1, px - x0)]:
                if 0 <= yy < hh and 0 <= xx < ww:
                    val += img2d[yy, xx] * wy * wx
        return val

    for b in range(n):
        for i in range(ho):
            for j in range(wo):
                col = np.zeros((taps, cin))
                for k in range(taps):
                    ky, kx = divmod(k, kw)
                    for g in range(groups):
                        dy = offset[b, i, j, 2 * (g * taps + k)]
                        dx = offset[b, i, j, 2 * (g * taps + k) + 1]
                        py = i * stride - padding + ky * dilation + dy
                        px = j * stride - padding + kx * dilation + dx
                        for c in range(cg):
                            v = sample(x[b, :, :, g * cg + c], py, px)
                            if mask is not None:
                                v *= mask[b, i, j, g * taps + k]
                            col[k, g * cg + c] = v
                out[b, i, j] = col.reshape(-1) @ weight.reshape(taps * cin, cout)
    if bias is not None:
        out += bias
    return out.astype(np.float32)


@pytest.mark.parametrize("groups,use_mask", [(1, False), (2, True)])
def test_deform_conv2d_matches_reference(rng, groups, use_mask):
    n, h, w, cin, cout, k = 1, 6, 7, 4, 3, 3
    x = rng.standard_normal((n, h, w, cin)).astype(np.float32)
    offset = (rng.standard_normal((n, h, w, 2 * groups * k * k)) * 1.5).astype(np.float32)
    weight = rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.1
    bias = rng.standard_normal((cout,)).astype(np.float32)
    mask = (
        rng.uniform(0, 1, size=(n, h, w, groups * k * k)).astype(np.float32)
        if use_mask
        else None
    )
    got = np.asarray(deform_conv2d(x, offset, weight, bias, 1, 1, 1, mask))
    want = _deform_conv_reference(x, offset, weight, bias, 1, 1, 1, mask)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_all_pairs_correlation(rng):
    f1 = rng.standard_normal((2, 4, 5, 8)).astype(np.float32)
    f2 = rng.standard_normal((2, 4, 5, 8)).astype(np.float32)
    got = np.asarray(all_pairs_correlation(f1, f2))
    want = np.einsum("nijc,nklc->nijkl", f1, f2) / np.sqrt(8.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_cost_volume_matches_shift_loop(rng):
    # mirrors reference pwc_modules.compute_cost_volume (max_disp window,
    # zero padding, channel mean)
    f1 = rng.standard_normal((1, 5, 6, 4)).astype(np.float32)
    f2 = rng.standard_normal((1, 5, 6, 4)).astype(np.float32)
    d = 2
    got = np.asarray(cost_volume(f1, f2, d))
    f2p = np.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    idx = 0
    for i in range(2 * d + 1):
        for j in range(2 * d + 1):
            want = np.mean(f1 * f2p[:, i : i + 5, j : j + 6, :], axis=-1)
            np.testing.assert_allclose(got[..., idx], want, rtol=1e-5, atol=1e-6)
            idx += 1


def test_spatial_correlation_sample(rng):
    # mirrors reference core/modules/correlation.py:7-49
    f1 = rng.standard_normal((1, 6, 6, 3)).astype(np.float32)
    f2 = rng.standard_normal((1, 6, 6, 3)).astype(np.float32)
    got = np.asarray(spatial_correlation_sample(f1, f2, patch_size=3))
    assert got.shape == (1, 3, 3, 6, 6)
    f2p = np.pad(f2, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for i in range(3):
        for j in range(3):
            want = np.sum(f1 * f2p[:, i : i + 6, j : j + 6, :], axis=-1)
            np.testing.assert_allclose(got[:, i, j], want, rtol=1e-5, atol=1e-6)
