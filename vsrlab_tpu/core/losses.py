"""Loss functions (pure, channels-last).

Mirrors the reference loss zoo (src/core/losses.py) as jittable functions.
The perceptual VGG loss lives in :mod:`vsrlab_tpu.core.perceptual` (it carries
parameters); everything here is parameter-free.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax.numpy as jnp

from vsrlab_tpu.ops.resize import resize_bilinear


def charbonnier_loss(x: jnp.ndarray, y: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Charbonnier (smooth L1) loss: ``mean(sqrt((x-y)^2 + eps))``.

    Reference src/core/losses.py:10-18 (note: eps inside the sqrt, not squared).
    """
    diff = x.astype(jnp.float32) - y.astype(jnp.float32)
    return jnp.mean(jnp.sqrt(diff * diff + eps))


def l1_loss(x: jnp.ndarray, y: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    """Weighted mean absolute error (reference ``WL1Loss``, src/core/losses.py:20-27)."""
    return jnp.mean(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))) * weight


def rmse_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Root-mean-square error (reference src/core/losses.py:76-77)."""
    diff = x.astype(jnp.float32) - y.astype(jnp.float32)
    return jnp.sqrt(jnp.mean(diff * diff))


def epe_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """End-point error for optical flow on ``(..., 2)`` channels-last flows.

    Reference ``EPELoss`` (src/optical_flow/models/spynet/nn.py:25-32): mean
    over pixels of the L2 norm of the flow difference.
    """
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-16))


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable binary cross entropy with logits (mean reduction)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    neg_abs = -jnp.abs(logits)
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(neg_abs))
    return jnp.mean(loss)


def adversarial_loss(
    logits: jnp.ndarray, target: float, is_disc: bool = False, weight: float = 2e-5
) -> jnp.ndarray:
    """GAN BCE loss (reference ``AdversarialLoss``, src/core/losses.py:66-74).

    Generator calls scale by ``weight``; discriminator calls (``is_disc=True``)
    return the raw BCE.
    """
    t = jnp.full_like(logits, target, dtype=jnp.float32)
    loss = bce_with_logits(logits, t)
    return loss if is_disc else loss * weight


def compute_loss(
    loss_fn: Callable,
    sr: jnp.ndarray,
    hr: jnp.ndarray,
    lq: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Supervised VSR loss with optional cleaning-branch term.

    Reference src/core/utils.py:235-240: when the model returns the cleaned
    low-quality clip ``lq``, add ``loss_fn(lq, resize(hr, lq_size))``.
    Inputs are ``(B, T, H, W, C)``.
    """
    loss = loss_fn(sr, hr)
    if lq is not None:
        h, w = lq.shape[-3], lq.shape[-2]
        loss = loss + loss_fn(lq, resize_bilinear(hr, (h, w)))
    return loss


class OpticalFlowConsistency:
    """L1 between frozen-RAFT flows of SR and HR clips (reference
    ``OpticalFlowConsistency``, src/core/losses.py:79-98).

    Holds frozen RAFT-small params (imported from the reference's shipped
    ``raft-small.pth`` when available, random otherwise) and compares the
    flow fields of adjacent-frame pairs of the two clips.
    """

    def __init__(self, weight: float = 1.0, raft_ckpt: Optional[str] = None):
        import jax

        from vsrlab_tpu.models.flow import RAFT, load_torch_raft

        self.weight = float(weight)
        self.model = RAFT(small=True, scale_factor=8)
        params = None
        ckpt = raft_ckpt or "/root/reference/src/optical_flow/weights/raft-small.pth"
        try:
            import os

            if os.path.exists(ckpt):
                import torch

                params = load_torch_raft(
                    torch.load(ckpt, map_location="cpu"), small=True
                )
        except Exception:
            params = None
        if params is None:
            dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(0), dummy, dummy
            )["params"]
        self.params = jax.lax.stop_gradient(params)

    def _flows(self, clip):
        import jax

        b, t, h, w, c = clip.shape
        img1 = clip[:, :-1].reshape(-1, h, w, c)
        img2 = clip[:, 1:].reshape(-1, h, w, c)
        return self.model.apply(
            {"params": jax.lax.stop_gradient(self.params)}, img2, img1
        )

    def __call__(self, sr: jnp.ndarray, hr: jnp.ndarray) -> jnp.ndarray:
        import jax

        flow_sr = self._flows(sr)
        flow_hr = jax.lax.stop_gradient(self._flows(hr))
        return l1_loss(flow_sr, flow_hr) * self.weight


class LossPipeline:
    """Config-driven multi-loss graph (reference ``LossPipeline``,
    src/core/losses.py:100-173).

    ``losses`` maps names to callables ``f(pred, gt) -> scalar``; ``pipeline``
    is a list of single-entry dicts ``{name: {"x": key, "y": key}}`` evaluated
    against a dict of tensors. A key prefixed ``match_`` is resized to the
    other operand's spatial size first.
    """

    def __init__(
        self,
        losses: Dict[str, Callable],
        pipeline: List[Dict],
        prefix: str | None = None,
        postfix: str | None = None,
    ):
        self.losses = dict(losses)
        self.pipeline = list(pipeline)
        self.prefix = prefix
        self.postfix = postfix

    def _name(self, base: str) -> str:
        name = base if self.prefix is None else self.prefix + base
        return name if self.postfix is None else name + self.postfix

    def __call__(self, args: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        args = dict(args)
        for key in self.losses:
            args[self._name(key)] = jnp.float32(0)
        args[self._name("loss")] = jnp.float32(0)
        for cfg in self.pipeline:
            (name, spec), = cfg.items()
            loss_fn = self.losses[name]
            pred_key, gt_key = spec["x"], spec["y"]
            if pred_key.startswith("match_"):
                pred, gt = self._match(args[pred_key.removeprefix("match_")], args[gt_key])
            elif gt_key.startswith("match_"):
                gt, pred = self._match(args[gt_key.removeprefix("match_")], args[pred_key])
            else:
                pred, gt = args[pred_key], args[gt_key]
            loss = loss_fn(pred, gt)
            args[self._name(name)] = args[self._name(name)] + loss
            args[self._name("loss")] = args[self._name("loss")] + loss
        return args

    @staticmethod
    def _match(matching, target):
        h, w = target.shape[-3], target.shape[-2]
        return resize_bilinear(matching, (h, w)), target
