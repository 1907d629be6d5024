"""Losses, metrics and schedulers vs torch / closed-form oracles."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vsrlab_tpu.core.losses import (
    charbonnier_loss,
    l1_loss,
    rmse_loss,
    epe_loss,
    adversarial_loss,
    compute_loss,
    LossPipeline,
)
from vsrlab_tpu.core.metrics import psnr, ssim, MetricCollection, running_metrics
from vsrlab_tpu.core.schedulers import cosine_annealing, cosine_annealing_linear_warmup


def test_charbonnier_matches_reference(rng):
    x = rng.standard_normal((2, 3, 4, 4, 3)).astype(np.float32)
    y = rng.standard_normal((2, 3, 4, 4, 3)).astype(np.float32)
    got = float(charbonnier_loss(x, y))
    want = torch.mean(
        torch.sqrt((torch.from_numpy(x) - torch.from_numpy(y)) ** 2 + 1e-9)
    ).item()
    assert abs(got - want) < 1e-6


def test_l1_rmse_epe(rng):
    x = rng.standard_normal((2, 4, 4, 2)).astype(np.float32)
    y = rng.standard_normal((2, 4, 4, 2)).astype(np.float32)
    assert abs(float(l1_loss(x, y, 2.0)) - 2 * np.abs(x - y).mean()) < 1e-6
    assert abs(float(rmse_loss(x, y)) - np.sqrt(((x - y) ** 2).mean())) < 1e-6
    want_epe = np.sqrt(((x - y) ** 2).sum(-1)).mean()
    assert abs(float(epe_loss(x, y)) - want_epe) < 1e-5


def test_adversarial_loss_matches_torch(rng):
    logits = rng.standard_normal((4, 8, 8, 1)).astype(np.float32)
    lt = torch.from_numpy(logits)
    want_g = F.binary_cross_entropy_with_logits(lt, torch.ones_like(lt)).item() * 2e-5
    want_d = F.binary_cross_entropy_with_logits(lt, torch.zeros_like(lt)).item()
    assert abs(float(adversarial_loss(logits, 1, False)) - want_g) < 1e-8
    assert abs(float(adversarial_loss(logits, 0, True)) - want_d) < 1e-5


def test_compute_loss_with_cleaning_branch(rng):
    # reference src/core/utils.py:235-240
    sr = rng.uniform(size=(1, 2, 8, 8, 3)).astype(np.float32)
    hr = rng.uniform(size=(1, 2, 8, 8, 3)).astype(np.float32)
    lq = rng.uniform(size=(1, 2, 4, 4, 3)).astype(np.float32)
    base = float(compute_loss(charbonnier_loss, sr, hr))
    full = float(compute_loss(charbonnier_loss, sr, hr, lq))
    assert full > base


def test_loss_pipeline(rng):
    sr = rng.uniform(size=(1, 2, 8, 8, 3)).astype(np.float32)
    hr = rng.uniform(size=(1, 2, 8, 8, 3)).astype(np.float32)
    pipe = LossPipeline(
        losses={"charb": charbonnier_loss, "l1": l1_loss},
        pipeline=[{"charb": {"x": "sr", "y": "hr"}}, {"l1": {"x": "sr", "y": "hr"}}],
    )
    out = pipe({"sr": sr, "hr": hr})
    assert abs(float(out["loss"]) - float(out["charb"]) - float(out["l1"])) < 1e-6


def test_psnr_known_value():
    x = np.zeros((1, 8, 8, 3), np.float32)
    y = np.full((1, 8, 8, 3), 0.1, np.float32)
    # mse = 0.01 -> psnr = 20 dB
    assert abs(float(psnr(x, y)) - 20.0) < 1e-4


def test_psnr_per_image_then_mean(rng):
    a = rng.uniform(size=(2, 8, 8, 3)).astype(np.float32)
    b = rng.uniform(size=(2, 8, 8, 3)).astype(np.float32)
    per = [
        10 * math.log10(1.0 / np.mean((a[i] - b[i]) ** 2)) for i in range(2)
    ]
    assert abs(float(psnr(a, b)) - np.mean(per)) < 1e-4


def test_ssim_identity_and_range(rng):
    x = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    assert abs(float(ssim(x, x)) - 1.0) < 1e-6
    y = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    v = float(ssim(x, y))
    assert -1.0 <= v < 0.7  # unrelated noise: low ssim


def test_ssim_matches_manual_gaussian(rng):
    """Cross-check against an independent numpy implementation."""
    from scipy.ndimage import convolve

    x = rng.uniform(size=(1, 24, 24, 1)).astype(np.float64)
    y = np.clip(x + 0.05 * rng.standard_normal(x.shape), 0, 1)

    coords = np.arange(11) - 5
    g = np.exp(-(coords**2) / (2 * 1.5**2))
    g /= g.sum()
    k2d = np.outer(g, g)

    def filt(a):
        out = convolve(a[0, :, :, 0], k2d, mode="constant")
        return out[5:-5, 5:-5]  # valid region

    mu_x, mu_y = filt(x), filt(y)
    sxx = filt(x * x) - mu_x**2
    syy = filt(y * y) - mu_y**2
    sxy = filt(x * y) - mu_x * mu_y
    c1, c2 = 0.01**2, 0.03**2
    want = np.mean(
        ((2 * mu_x * mu_y + c1) * (2 * sxy + c2))
        / ((mu_x**2 + mu_y**2 + c1) * (sxx + syy + c2))
    )
    got = float(ssim(x.astype(np.float32), y.astype(np.float32)))
    assert abs(got - want) < 1e-4


def test_metric_collection_and_running(rng):
    sr = rng.uniform(size=(1, 2, 16, 16, 3)).astype(np.float32)
    hr = rng.uniform(size=(1, 2, 16, 16, 3)).astype(np.float32)
    mc = MetricCollection()
    out = mc(sr, hr)
    assert set(out) == {"PSNR", "SSIM"}
    acc = running_metrics({"PSNR": 0.0, "SSIM": 0.0}, mc, sr, hr)
    acc = running_metrics(acc, mc, sr, hr)
    assert abs(acc["PSNR"] - 2 * float(out["PSNR"])) < 1e-3


def test_cosine_annealing_matches_torch():
    lin = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(lin.parameters(), lr=0.1)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=50, eta_min=1e-3)
    ours = cosine_annealing(0.1, 50, 1e-3)
    for step in range(120):
        want = opt.param_groups[0]["lr"]
        got = float(ours(step))
        assert abs(got - want) < 1e-6, f"step {step}: {got} vs {want}"
        opt.step()
        sched.step()


def test_warmup_cosine_schedule_shape():
    sched = cosine_annealing_linear_warmup(
        max_lr=1e-3, first_cycle_steps=100, min_lr=1e-5, warmup_steps=10, gamma=0.5
    )
    lrs = [float(sched(s)) for s in range(250)]
    # warmup rises
    assert lrs[0] < lrs[5] < lrs[9]
    assert abs(lrs[10] - 1e-3) < 1e-4  # peak after warmup
    # cosine decays to min at end of cycle
    assert abs(lrs[99] - 1e-5) < 5e-5
    # second cycle peaks at gamma * max
    assert abs(max(lrs[100:200]) - 5e-4) < 5e-5


def test_rgb_to_y_known_values():
    """BT.601 limited-range luma: white -> 235/255, black -> 16/255
    (matlab rgb2ycbcr convention, the Vimeo/Vid4 protocol)."""
    from vsrlab_tpu.core.metrics import rgb_to_y

    white = np.ones((1, 2, 2, 3), np.float32)
    black = np.zeros((1, 2, 2, 3), np.float32)
    np.testing.assert_allclose(
        np.asarray(rgb_to_y(white)), 235.0 / 255.0, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(rgb_to_y(black)), 16.0 / 255.0, rtol=1e-5
    )


def test_psnr_y_matches_manual(rng):
    """PSNR_Y == PSNR computed on a manually converted luma channel."""
    from vsrlab_tpu.core.metrics import psnr_y

    a = rng.uniform(size=(2, 8, 8, 3)).astype(np.float32)
    b = rng.uniform(size=(2, 8, 8, 3)).astype(np.float32)

    def y(img):
        return (
            65.481 * img[..., 0] + 128.553 * img[..., 1]
            + 24.966 * img[..., 2] + 16.0
        ) / 255.0

    manual = np.mean([
        10 * math.log10(1.0 / np.mean((y(a[i]) - y(b[i])) ** 2))
        for i in range(2)
    ])
    assert abs(float(psnr_y(a, b)) - manual) < 1e-4


def test_y_metrics_in_builtin_registry(rng):
    """Config surface: metrics: [PSNR_Y, SSIM_Y] instantiates."""
    col = MetricCollection(["PSNR_Y", "SSIM_Y"])
    a = rng.uniform(size=(1, 2, 16, 16, 3)).astype(np.float32)
    out = col(a, a)
    assert set(out) == {"PSNR_Y", "SSIM_Y"}
    assert abs(float(out["SSIM_Y"]) - 1.0) < 1e-6


def test_train_step_metric_names_from_config(rng):
    """The jitted steps honour a configured metric list (reference
    build_metric, src/core/utils.py:178-181)."""
    import jax
    import jax.numpy as jnp
    import optax

    from vsrlab_tpu.models import RealBasicVSR
    from vsrlab_tpu.train.state import create_train_state
    from vsrlab_tpu.train.step import make_eval_step, make_supervised_train_step

    model = RealBasicVSR(
        mid_channels=8, res_blocks=1, cleaning_blocks=1, cleaning_steps=1
    )
    lr = jnp.asarray(rng.uniform(size=(2, 2, 8, 8, 3)), jnp.float32)
    hr = jnp.asarray(rng.uniform(size=(2, 2, 32, 32, 3)), jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), lr, optax.sgd(1e-3), init_jit=False
    )
    step = make_supervised_train_step(
        model, donate=False, metrics=("PSNR_Y",), num_grad_accum=2
    )
    _, m = step(state, {"lr": lr, "hr": hr})
    assert set(m) == {"Loss", "PSNR_Y"}

    ev = make_eval_step(model, metrics=("PSNR", "SSIM_Y"))
    m, _ = ev(state.params, {"lr": lr, "hr": hr})
    assert set(m) == {"Loss", "PSNR", "SSIM_Y"}
