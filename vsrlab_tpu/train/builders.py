"""Builders: config → optimizer chain / model / loaders.

The functional analogue of the reference's setup helpers
(src/core/utils.py:92-233): everything returns values, nothing mutates
global state.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vsrlab_tpu.core import schedulers
from vsrlab_tpu.core.config import Config, instantiate
from vsrlab_tpu.data import DataLoader


def build_schedule(spec, base_lr: float) -> Callable[[int], float]:
    """(name, kwargs) spec → optax schedule (step -> lr)."""
    if spec is None:
        return lambda step: base_lr
    name, kw = spec if isinstance(spec, tuple) else instantiate(spec)
    if name == "cosine":
        return schedulers.cosine_annealing(
            base_lr, int(kw.get("T_max", 1_000_000)), float(kw.get("eta_min", 0.0))
        )
    if name == "cosine_warmup":
        min_lr, min_lr_pow = kw.get("min_lr"), kw.get("min_lr_pow")
        if min_lr is None and min_lr_pow is None:
            min_lr = 0.0  # the scheduler requires exactly one of the two
        return schedulers.cosine_annealing_linear_warmup(
            max_lr=base_lr,
            first_cycle_steps=int(kw.get("first_cycle_steps", 1_000_000)),
            min_lr=min_lr,
            min_lr_pow=min_lr_pow,
            cycle_mult=float(kw.get("cycle_mult", 1.0)),
            warmup_steps=int(kw.get("warmup_steps", 0)),
            gamma=float(kw.get("gamma", 1.0)),
        )
    raise ValueError(f"unknown schedule: {name}")


def build_tx(
    optimizer_cfg,
    scheduler_cfg=None,
    grad_clip: Optional[float] = None,
    frozen_mask: Optional[Any] = None,
    skip_nonfinite: int = 0,
) -> optax.GradientTransformation:
    """Optimizer config (+ schedule + clip) → one optax chain
    (reference build_optimizer + update_weights,
    src/core/utils.py:92-123,270-281).

    ``skip_nonfinite > 0`` wraps the chain in ``optax.apply_if_finite``:
    updates containing inf/NaN leave params and optimizer state
    untouched — the TPU-native analogue of the reference's
    ``GradScaler.step`` skip (src/core/utils.py:277), which the bf16
    compute path (no loss scaler) otherwise loses. After that many
    CONSECUTIVE non-finite updates, the update applies anyway so a
    persistent divergence surfaces instead of silently stalling."""
    name, kw = instantiate(optimizer_cfg)
    lr = float(kw.get("lr", 1e-4))
    schedule = build_schedule(scheduler_cfg, lr)
    betas = kw.get("betas", (0.9, 0.999))
    eps = float(kw.get("eps", 1e-8))
    wd = float(kw.get("weight_decay", 0.0) or 0.0)

    if name in ("adam", "adamw"):
        if wd or name == "adamw":
            core = optax.adamw(schedule, b1=betas[0], b2=betas[1], eps=eps, weight_decay=wd)
        else:
            core = optax.adam(schedule, b1=betas[0], b2=betas[1], eps=eps)
    elif name == "sgd":
        core = optax.sgd(schedule, momentum=kw.get("momentum"))
    else:
        raise ValueError(f"unknown optimizer: {name}")

    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(float(grad_clip)))
    parts.append(core)
    tx = optax.chain(*parts)
    if frozen_mask is not None:
        tx = optax.masked(tx, frozen_mask)
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, int(skip_nonfinite))
    return tx


def build_model(model_cfg, precision: str = "fp32"):
    """Instantiate a model with the configured compute dtype (bf16 ≙ AMP,
    reference src/train.py:93)."""
    dtype = jnp.bfloat16 if precision in ("bf16", "bfloat16") else None
    return instantiate(model_cfg, dtype=dtype)


def build_loaders(
    data_cfg: Config,
    num_grad_acc: int = 1,
    device_put: Optional[Callable] = None,
    num_shards: int = 1,
    shard_index: int = 0,
    seed: int = 0,
) -> Tuple[DataLoader, Optional[DataLoader]]:
    """Train/val loaders (reference build_loaders,
    src/core/utils.py:193-233). ``seed`` drives the shuffle order
    (reference: the seeded DistributedSampler)."""
    train_ds = instantiate(data_cfg.datasets.train)
    val_ds = (
        instantiate(data_cfg.datasets.val)
        if data_cfg.get("datasets", {}).get("val")
        else None
    )
    common = dict(
        num_workers=int(data_cfg.get("num_workers", 4)),
        prefetch_factor=int(data_cfg.get("prefetch_factor", 2)),
        num_shards=num_shards,
        shard_index=shard_index,
        device_put=device_put,
        seed=int(seed),
    )
    train_dl = DataLoader(
        train_ds, batch_size=int(data_cfg.batch_size), shuffle=True, **common
    )
    # drop_last also for val: variable trailing batch shapes would
    # re-trigger XLA compilation every epoch
    val_dl = (
        DataLoader(
            val_ds,
            batch_size=max(num_shards, int(data_cfg.batch_size) // max(num_grad_acc, 1)),
            shuffle=False,
            drop_last=True,
            **common,
        )
        if val_ds is not None and len(val_ds)
        else None
    )
    return train_dl, val_dl
