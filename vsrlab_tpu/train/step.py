"""Jitted SPMD train / eval steps.

One pure function replaces the reference's per-batch hot loop
(src/train.py:85-101 + src/core/utils.py:235-281):

* forward (+ cleaning branch), Charbonnier loss, grads, clip, update —
  all inside one ``jit``;
* gradient accumulation = ``lax.scan`` over a leading microbatch axis
  (reference divides the loss and steps every ``num_grad_acc`` batches);
* data parallelism: the batch axis is sharded over the mesh ``data``
  axis; XLA emits the gradient all-reduce over ICI automatically;
* PSNR/SSIM computed on-device in the same program — no per-batch
  ``.item()`` device syncs (reference src/core/utils.py:249-252).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vsrlab_tpu.core.losses import charbonnier_loss
from vsrlab_tpu.core.metrics import MetricCollection, resolve_metric_names
from vsrlab_tpu.ops.resize import resize_bilinear
from vsrlab_tpu.train.state import TrainState

Batch = Dict[str, jnp.ndarray]

DEFAULT_METRICS = ("PSNR", "SSIM")


def metrics_from_config(tcfg) -> Tuple[str, ...]:
    """Resolve the metric set from a ``train`` config section
    (``metric.metrics``; reference build_metric, src/core/utils.py:178-181),
    validated against the builtin registry."""
    return resolve_metric_names(
        (tcfg.get("metric") or {}).get("metrics") or DEFAULT_METRICS
    )


def _resize_clip_to(hr: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Bicubic-free downscale of HR clips to the LR grid for the cleaning
    loss (reference uses kornia resize, src/core/utils.py:238-239)."""
    b, t, h, w, c = hr.shape
    th, tw = like.shape[2:4]
    out = resize_bilinear(hr.reshape(b * t, h, w, c), (th, tw), align_corners=False)
    return out.reshape(b, t, th, tw, c)


def default_metrics(sr, hr, names=DEFAULT_METRICS) -> Dict[str, jnp.ndarray]:
    """On-device metrics by builtin name (config surface
    ``train.metric.metrics``, mirroring the reference's build_metric,
    src/core/utils.py:178-181; Y variants enable the luma protocol)."""
    sr = jnp.clip(sr, 0.0, 1.0)
    hr = jnp.clip(hr, 0.0, 1.0)
    return {k: MetricCollection.BUILTIN[k](sr, hr) for k in names}


def supervised_loss(
    model_out,
    batch: Batch,
    loss_fn: Callable = charbonnier_loss,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Charbonnier(sr, hr) + Charbonnier(lq, resize(hr)) when the model
    returns a cleaned branch (reference compute_loss,
    src/core/utils.py:235-240)."""
    if isinstance(model_out, tuple):
        sr, lq = model_out
    else:
        sr, lq = model_out, None
    hr = batch["hr"]
    loss = loss_fn(sr, hr)
    if lq is not None:
        loss = loss + loss_fn(lq, _resize_clip_to(hr, lq))
    return loss, {"sr": sr}


def ema_update(state: TrainState, decay: float) -> TrainState:
    """``ema ← decay·ema + (1-decay)·params`` (no-op when disabled)."""
    if not decay or state.ema_params is None:
        return state
    return state.replace(
        ema_params=jax.tree.map(
            lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
            state.ema_params,
            state.params,
        )
    )


def make_supervised_train_step(
    model,
    loss_fn: Callable = charbonnier_loss,
    num_grad_accum: int = 1,
    compute_metrics: bool = True,
    donate: bool = True,
    ema_decay: float = 0.0,
    metrics: Tuple[str, ...] = DEFAULT_METRICS,
    log_grad_norm: bool = False,
):
    """Build the jitted supervised train step.

    The returned ``train_step(state, batch)`` expects ``batch`` dict with
    ``lr``/``hr`` clips of shape ``(B, T, H, W, 3)``; when
    ``num_grad_accum > 1``, ``B`` must be divisible by it and microbatches
    are scanned sequentially (grad-accum semantics of reference
    update_weights, src/core/utils.py:270-281). ``ema_decay > 0``
    maintains ``state.ema_params`` (create the state with the same decay).
    ``log_grad_norm`` adds the global gradient norm (post-accumulation,
    PRE-clip) to the returned metrics as ``GradNorm`` — one extra
    reduction over params, in-program (no device sync).
    """
    import optax

    metrics = resolve_metric_names(metrics)

    def loss_for(params, lr, hr):
        out = model.apply({"params": params}, lr)
        loss, aux = supervised_loss(out, {"lr": lr, "hr": hr}, loss_fn)
        return loss, aux

    grad_fn = jax.value_and_grad(loss_for, has_aux=True)

    def step(state: TrainState, batch: Batch):
        lr, hr = batch["lr"], batch["hr"]
        if num_grad_accum == 1:
            (loss, aux), grads = grad_fn(state.params, lr, hr)
            sr = aux["sr"]
            new_state = ema_update(
                state.apply_gradients(grads=grads), ema_decay
            )
            out_metrics = {"Loss": loss}
            if log_grad_norm:
                out_metrics["GradNorm"] = optax.global_norm(grads)
            if compute_metrics:
                out_metrics.update(default_metrics(sr, hr, metrics))
            return new_state, out_metrics

        # num_grad_accum > 1: scan microbatches, carrying only the grad
        # sum and SCALAR metric sums — stacking each microbatch's SR
        # output (the old formulation) would materialise the full-batch
        # activation footprint grad accumulation exists to avoid
        b = lr.shape[0]
        mb = b // num_grad_accum
        lr_m = lr.reshape((num_grad_accum, mb) + lr.shape[1:])
        hr_m = hr.reshape((num_grad_accum, mb) + hr.shape[1:])

        def accum(carry, xs):
            g_acc, l_acc, m_acc = carry
            lr_i, hr_i = xs
            (l, aux_i), g = grad_fn(state.params, lr_i, hr_i)
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            if compute_metrics:
                m_i = default_metrics(aux_i["sr"], hr_i, metrics)
                m_acc = {k: m_acc[k] + m_i[k] for k in m_acc}
            return (g_acc, l_acc + l, m_acc), None

        g0 = jax.tree.map(jnp.zeros_like, state.params)
        m0 = (
            {k: jnp.zeros((), jnp.float32) for k in metrics}
            if compute_metrics
            else {}
        )
        (grads, loss, msums), _ = jax.lax.scan(
            accum, (g0, jnp.zeros((), jnp.float32), m0), (lr_m, hr_m)
        )
        grads = jax.tree.map(lambda g: g / num_grad_accum, grads)
        new_state = ema_update(state.apply_gradients(grads=grads), ema_decay)
        out_metrics = {"Loss": loss / num_grad_accum}
        if log_grad_norm:
            out_metrics["GradNorm"] = optax.global_norm(grads)
        if compute_metrics:
            out_metrics.update(
                {k: v / num_grad_accum for k, v in msums.items()}
            )
        return new_state, out_metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model,
    loss_fn: Callable = charbonnier_loss,
    metrics: Tuple[str, ...] = DEFAULT_METRICS,
):
    """Jitted eval step: forward + loss + configured metrics (reference
    evaluate, src/train.py:28-50). Returns (metrics, sr) so callers can
    log image grids."""
    metric_names = resolve_metric_names(metrics)

    def step(params, batch: Batch):
        out = model.apply({"params": params}, batch["lr"])
        loss, aux = supervised_loss(out, batch, loss_fn)
        sr = aux["sr"]
        out_metrics = {
            "Loss": loss, **default_metrics(sr, batch["hr"], metric_names)
        }
        return out_metrics, sr

    return jax.jit(step)
