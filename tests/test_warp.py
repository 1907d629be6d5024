"""grid_sample / flow_warp vs torch.nn.functional.grid_sample oracles."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from conftest import to_nchw, to_nhwc
from vsrlab_tpu.ops.warp import grid_sample, flow_warp


def _torch_grid_sample(x_nhwc, grid, mode, padding_mode, align_corners):
    xt = torch.from_numpy(to_nchw(x_nhwc))
    gt = torch.from_numpy(grid)
    out = F.grid_sample(xt, gt, mode=mode, padding_mode=padding_mode, align_corners=align_corners)
    return to_nhwc(out.numpy())


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("padding_mode", ["zeros", "border", "reflection"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_matches_torch(rng, mode, padding_mode, align_corners):
    x = rng.standard_normal((2, 9, 11, 3)).astype(np.float32)
    # grids beyond [-1, 1] exercise the padding modes; avoid exact .5 pixel
    # boundaries so nearest-rounding ties don't flake
    grid = (rng.uniform(-1.7, 1.7, size=(2, 6, 7, 2)) + 1e-4).astype(np.float32)
    got = np.asarray(grid_sample(x, grid, mode, padding_mode, align_corners))
    want = _torch_grid_sample(x, grid, mode, padding_mode, align_corners)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grid_sample_gradients_flow(rng):
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1, 1, size=(1, 4, 4, 2)).astype(np.float32))

    def loss(x, grid):
        return jnp.sum(grid_sample(x, grid, "bilinear", "zeros", True) ** 2)

    gx, gg = jax.grad(loss, argnums=(0, 1))(x, grid)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(gg)).all()
    assert float(jnp.abs(gg).sum()) > 0.0


def _torch_flow_warp(x_nhwc, flow_nhwc, interpolation, padding_mode, align_corners):
    """Torch oracle mirroring reference flow_warp semantics
    (src/vsr/models/RealBasicVSR/modules/spynet.py:95-106)."""
    n, h, w, _ = x_nhwc.shape
    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    grid = np.stack([gx, gy], axis=-1).astype(np.float32)
    vgrid = grid[None] + flow_nhwc
    nx = 2.0 * vgrid[..., 0] / max(w - 1, 1) - 1.0
    ny = 2.0 * vgrid[..., 1] / max(h - 1, 1) - 1.0
    g = np.stack([nx, ny], axis=-1).astype(np.float32)
    return _torch_grid_sample(x_nhwc, g, interpolation, padding_mode, align_corners)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_flow_warp_matches_torch(rng, padding_mode):
    x = rng.standard_normal((2, 12, 10, 4)).astype(np.float32)
    flow = (rng.standard_normal((2, 12, 10, 2)) * 3).astype(np.float32)
    got = np.asarray(flow_warp(x, flow, "bilinear", padding_mode))
    want = _torch_flow_warp(x, flow, "bilinear", padding_mode, True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_flow_warp_zero_flow_is_identity(rng):
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    got = np.asarray(flow_warp(x, flow))
    np.testing.assert_allclose(got, x, rtol=1e-6, atol=1e-6)


def test_flow_warp_nearest4(rng):
    """nearest4 returns the 4 nearest taps stacked on channels
    (reference VRT/modules/spynet.py:39-54)."""
    x = rng.standard_normal((1, 9, 9, 3)).astype(np.float32)
    flow = (rng.standard_normal((1, 9, 9, 2)) * 2 + 0.3).astype(np.float32)
    got = np.asarray(flow_warp(x, flow, "nearest4"))
    assert got.shape == (1, 9, 9, 12)

    # oracle: four nearest-mode torch grid_samples at floor/ceil corners
    h = w = 9
    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    vg = np.stack([gx, gy], -1)[None] + flow
    outs = []
    for fx, fy in [(np.floor, np.floor), (np.floor, np.ceil), (np.ceil, np.floor), (np.ceil, np.ceil)]:
        nx = 2.0 * fx(vg[..., 0]) / (w - 1) - 1.0
        ny = 2.0 * fy(vg[..., 1]) / (h - 1) - 1.0
        g = np.stack([nx, ny], -1).astype(np.float32)
        outs.append(_torch_grid_sample(x, g, "nearest", "zeros", True))
    want = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestPackedGatherEquivalence:
    """The packed-window single-take formulation (round 3) must match the
    reference 4-corner formulation on every padding mode, including
    out-of-range coords (zeros masks), odd widths (W padded to the group
    multiple), and integer flows (bitwise)."""

    @pytest.mark.parametrize("padding_mode", ["zeros", "border", "reflection"])
    @pytest.mark.parametrize("shape", [(2, 9, 11, 3), (1, 8, 24, 3), (2, 5, 7, 1), (1, 6, 16, 8)])
    def test_matches_corner_path(self, rng, padding_mode, shape, monkeypatch):
        import vsrlab_tpu.ops.warp as warp_mod

        x = rng.standard_normal(shape).astype(np.float32)
        grid = (rng.uniform(-1.7, 1.7, size=(shape[0], 6, 7, 2)) + 1e-4).astype(np.float32)
        packed = np.asarray(grid_sample(x, grid, "bilinear", padding_mode, True))
        monkeypatch.setattr(warp_mod, "USE_PACKED_GATHER", False)
        corner = np.asarray(grid_sample(x, grid, "bilinear", padding_mode, True))
        np.testing.assert_allclose(packed, corner, rtol=1e-6, atol=1e-6)

    def test_integer_flow_bitwise(self, rng):
        x = rng.standard_normal((1, 8, 16, 3)).astype(np.float32)
        flow = np.zeros((1, 8, 16, 2), np.float32)
        flow[..., 0] = 3.0
        flow[..., 1] = -2.0
        got = np.asarray(flow_warp(x, flow, padding_mode="border"))
        want = np.empty_like(x)
        for j in range(8):
            for i in range(16):
                want[0, j, i] = x[0, min(max(j - 2, 0), 7), min(max(i + 3, 0), 15)]
        np.testing.assert_array_equal(got, want)

    def test_grad_matches_corner_path(self, rng, monkeypatch):
        import jax
        import jax.numpy as jnp

        import vsrlab_tpu.ops.warp as warp_mod

        x = jnp.asarray(rng.standard_normal((2, 8, 16, 3)).astype(np.float32))
        flow = jnp.asarray(rng.normal(0, 3, (2, 8, 16, 2)).astype(np.float32))

        def loss(x, f):
            return jnp.sum(flow_warp(x, f) ** 2)

        gx_p, gf_p = jax.grad(loss, argnums=(0, 1))(x, flow)
        monkeypatch.setattr(warp_mod, "USE_PACKED_GATHER", False)
        gx_c, gf_c = jax.grad(loss, argnums=(0, 1))(x, flow)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_c), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_c), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_nearest4_packed_matches_per_tap(rng, padding_mode, monkeypatch):
    """Packed-window nearest4 (one take + 4 one-hot selects) must match
    the per-tap path, including integer coords where ceil == floor."""
    import vsrlab_tpu.ops.warp as warp_mod

    x = rng.standard_normal((2, 9, 11, 3)).astype(np.float32)
    flow = rng.normal(0, 3, (2, 9, 11, 2)).astype(np.float32)
    flow[0, 0, 0] = (2.0, -1.0)  # exact-integer taps
    flow[0, 1, 1] = (100.0, 100.0)  # far out of range
    packed = np.asarray(flow_warp(x, flow, "nearest4", padding_mode))
    monkeypatch.setattr(warp_mod, "USE_PACKED_GATHER", False)
    per_tap = np.asarray(flow_warp(x, flow, "nearest4", padding_mode))
    np.testing.assert_array_equal(packed, per_tap)
