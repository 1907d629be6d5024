"""Resize ops vs torch.nn.functional.interpolate oracles."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from conftest import to_nchw, to_nhwc
from vsrlab_tpu.ops.resize import resize, resize_trilinear


SIZES_2D = [
    ((4, 7, 9, 3), (14, 18)),   # upsample, non-multiple
    ((2, 16, 16, 3), (64, 64)),  # 4x upsample
    ((2, 17, 23, 2), (5, 7)),    # downsample
    ((1, 8, 8, 1), (8, 8)),      # identity
]


@pytest.mark.parametrize("shape,size", SIZES_2D)
@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
def test_resize_2d_matches_torch(rng, shape, size, align_corners, mode):
    x = rng.standard_normal(shape).astype(np.float32)
    got = np.asarray(resize(x, size, mode, align_corners))
    want = F.interpolate(
        torch.from_numpy(to_nchw(x)), size=size, mode=mode, align_corners=align_corners
    ).numpy()
    np.testing.assert_allclose(got, to_nhwc(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,size", [((4, 7, 9, 3), (14, 18)), ((2, 17, 23, 2), (5, 7))])
def test_resize_nearest_matches_torch(rng, shape, size):
    x = rng.standard_normal(shape).astype(np.float32)
    got = np.asarray(resize(x, size, "nearest"))
    want = F.interpolate(torch.from_numpy(to_nchw(x)), size=size, mode="nearest").numpy()
    np.testing.assert_allclose(got, to_nhwc(want), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("align_corners", [True, False])
def test_resize_trilinear_matches_torch(rng, align_corners):
    # VRT global residual: trilinear over (T, H, W) — reference vrt.py:164
    x = rng.standard_normal((2, 5, 8, 9, 3)).astype(np.float32)
    size = (7, 32, 36)
    got = np.asarray(resize_trilinear(x, size, align_corners))
    xt = torch.from_numpy(np.moveaxis(x, -1, 1))  # (N, C, T, H, W)
    want = F.interpolate(xt, size=size, mode="trilinear", align_corners=align_corners).numpy()
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), rtol=1e-5, atol=1e-5)


def test_resize_leading_batch_dims(rng):
    # (B, T, H, W, C) clips resize like flattened frames
    x = rng.standard_normal((2, 3, 8, 8, 3)).astype(np.float32)
    got = np.asarray(resize(x, (16, 16)))
    flat = np.asarray(resize(x.reshape(6, 8, 8, 3), (16, 16)))
    np.testing.assert_allclose(got.reshape(6, 16, 16, 3), flat, rtol=1e-6)


def test_resize_scheduled_dtype_preserved(rng):
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float16)
    out = resize(x, (16, 16))
    assert out.dtype == np.float16
