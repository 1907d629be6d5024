"""GAN fine-tuning trainer (generator + UNet discriminator).

Capability parity with the reference ``train_gan.py``:

* generator step (reference :35-47): pixel (Charbonnier sr/hr + cleaning
  branch) + VGG perceptual + adversarial ``BCE(D(sr), 1)·w`` losses;
* discriminator step (reference :49-58): ``BCE(D(hr), 1) + BCE(D(sr⊥), 0)``
  on flattened frames, spectral-norm power-iteration state updated;
* the generator is frozen until ``epoch > freeze_epochs`` (reference
  :115-117) — two jit specialisations, not a traced branch;
* dual optimizers/schedulers from the ``gan_adam``/``gan_cosine`` groups.

Both networks update inside ONE jitted step per epoch-phase; everything
else (loaders, logging, checkpoints, mesh) is shared with the supervised
trainer.
"""

from __future__ import annotations

import sys
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

import vsrlab_tpu.components  # noqa: F401
from vsrlab_tpu.core.checkpoint import CheckpointManager
from vsrlab_tpu.core.config import Config, instantiate, load_config
from vsrlab_tpu.core.loggers import build_logger
from vsrlab_tpu.core.losses import adversarial_loss, charbonnier_loss
from vsrlab_tpu.core.perceptual import PerceptualLoss
from vsrlab_tpu.parallel import create_mesh, process_index, replicated, shard_batch
from vsrlab_tpu.train.builders import build_loaders, build_model, build_tx
from vsrlab_tpu.train.state import TrainState, create_train_state
from vsrlab_tpu.train.step import (
    DEFAULT_METRICS,
    _resize_clip_to,
    default_metrics,
    ema_update,
    make_eval_step,
    metrics_from_config,
)
from vsrlab_tpu.train.train import (
    _accumulate,
    _load_ema_params,
    _mean_metrics,
    _restore_ema,
)


def make_gan_train_step(
    model,
    discriminator,
    perceptual_loss,
    adv_weight: float = 2e-5,
    update_generator: bool = True,
    donate: bool = True,
    ema_decay: float = 0.0,
    metrics=DEFAULT_METRICS,
):
    """One jitted step updating generator (optionally) and discriminator."""
    from vsrlab_tpu.core.metrics import resolve_metric_names

    metric_names = resolve_metric_names(metrics)

    def frames(clip):
        return clip.reshape((-1,) + clip.shape[2:])

    def g_loss_fn(g_params, d_vars, lr, hr):
        sr, lq = model.apply({"params": g_params}, lr)
        pixel = charbonnier_loss(sr, hr) + charbonnier_loss(
            lq, _resize_clip_to(hr, lq)
        )
        logits_sr = discriminator.apply(d_vars, frames(sr))
        adv = adversarial_loss(logits_sr, 1.0, is_disc=False, weight=adv_weight)
        perc = (
            perceptual_loss(sr, hr)
            if perceptual_loss is not None
            else jnp.zeros((), jnp.float32)
        )
        total = pixel + perc + adv
        return total, {"sr": sr, "PixelLoss": pixel, "PerceptualLoss": perc,
                       "AdversarialLoss": adv}

    def d_loss_fn(d_params, d_stats, sr, hr):
        variables = {"params": d_params, "batch_stats": d_stats}
        logits_hr, upd = discriminator.apply(
            variables, frames(hr), update_stats=True, mutable=["batch_stats"]
        )
        logits_sr, upd = discriminator.apply(
            {"params": d_params, "batch_stats": upd["batch_stats"]},
            frames(jax.lax.stop_gradient(sr)),
            update_stats=True,
            mutable=["batch_stats"],
        )
        loss = adversarial_loss(logits_hr, 1.0, is_disc=True) + adversarial_loss(
            logits_sr, 0.0, is_disc=True
        )
        return loss, upd["batch_stats"]

    def step(g_state: TrainState, d_state: TrainState, batch):
        lr, hr = batch["lr"], batch["hr"]
        d_vars = {"params": d_state.params, "batch_stats": d_state.batch_stats}

        (loss_g, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            g_state.params, d_vars, lr, hr
        )
        if update_generator:
            # EMA shadow follows ONLY real generator updates (frozen
            # epochs leave it untouched)
            g_state = ema_update(
                g_state.apply_gradients(grads=g_grads), ema_decay
            )

        (loss_d, new_stats), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(d_state.params, d_state.batch_stats, aux["sr"], hr)
        d_state = d_state.apply_gradients(grads=d_grads)
        d_state = d_state.replace(batch_stats=new_stats)

        metrics = {
            "Loss": loss_g,
            "LossDiscriminator": loss_d,
            "PixelLoss": aux["PixelLoss"],
            "PerceptualLoss": aux["PerceptualLoss"],
            "AdversarialLoss": aux["AdversarialLoss"],
        }
        metrics.update(default_metrics(aux["sr"], hr, metric_names))
        return g_state, d_state, metrics

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def restore_generator(g_state, tcfg):
    """Generator restore with the reference's setup_train semantics
    (src/core/utils.py:106-123 applied to the generator, train_gan.py:77):

    * ``restore`` alone — weights only (template-less restore + graft, so
      a SUPERVISED checkpoint with a different optimizer tree loads —
      the basic_gan fine-tune entry path), resume at epoch+1;
    * ``restore_opt`` — same-run resume: params + optimizer state
      (structures match, full-template sharded restore);
    * ``finetune`` — epoch counter reset to 0.

    Returns ``(g_state, start_epoch)``.
    """
    start_epoch = 0
    if tcfg.get("restore"):
        src = CheckpointManager(tcfg.restore)
        if tcfg.get("restore_opt"):
            key, payload = src.restore(
                epoch=tcfg.get("restore_step"),
                template={
                    "params": jax.device_get(g_state.params),
                    "opt_state": jax.device_get(g_state.opt_state),
                },
            )
            g_state = g_state.replace(
                params=payload["params"], opt_state=payload["opt_state"]
            )
        else:
            key, payload = src.restore(epoch=tcfg.get("restore_step"))
            g_state = g_state.replace(
                params=jax.tree.map(
                    lambda t, s: jnp.asarray(s, t.dtype),
                    g_state.params,
                    payload["params"],
                )
            )
        # step-keyed checkpoints (supervised save_every_steps) carry the
        # epoch in a meta sidecar; GAN resume is epoch-granular
        if tcfg.get("restore_ema"):
            # fine-tune from the source run's EMA average instead of its
            # raw weights (the natural GAN-finetune init when the
            # supervised run kept a shadow)
            g_state = g_state.replace(
                params=_load_ema_params(tcfg.restore, key, g_state.params)
            )
        if g_state.ema_params is not None:
            # EMA-enabled fine-tune: restore the source run's shadow when
            # it has one, else seed from the restored weights
            g_state = _restore_ema(g_state, tcfg.restore, key)
        meta = src.load_meta(key)
        epoch = int(meta["epoch"]) if meta else key
        start_epoch = 0 if tcfg.get("finetune") else epoch + 1
        src.close()
        print(
            f"restored generator @ key {key} from {tcfg.restore}; "
            f"resuming from epoch {start_epoch}"
        )
    return g_state, start_epoch


def run(cfg: Config) -> Dict[str, float]:
    tcfg = cfg.train
    mesh = create_mesh() if tcfg.get("ddp", True) else create_mesh(1)

    model = build_model(tcfg.model, tcfg.get("precision", "fp32"))
    discriminator = instantiate(tcfg.discriminator)

    skip_nf = int(tcfg.get("skip_nonfinite", 0) or 0)
    tx_g = build_tx(
        tcfg.optimizer.generator,
        tcfg.get("scheduler", {}).get("generator"),
        tcfg.get("gradient_clip_val"),
        skip_nonfinite=skip_nf,
    )
    tx_d = build_tx(
        tcfg.optimizer.discriminator,
        tcfg.get("scheduler", {}).get("discriminator"),
        tcfg.get("gradient_clip_val"),
        skip_nonfinite=skip_nf,
    )

    train_dl, val_dl = build_loaders(
        tcfg.data,
        num_grad_acc=int(tcfg.get("num_grad_acc", 1)),
        device_put=lambda b: shard_batch(b, mesh),
        num_shards=jax.process_count(),
        shard_index=jax.process_index(),
        seed=int(cfg.get("seed_index") or 0),
    )

    lr0, hr0 = train_dl.dataset[0]
    rng = jax.random.PRNGKey(int(cfg.get("seed_index") or 0))
    ema_decay = float(tcfg.get("ema_decay", 0.0))
    g_state = create_train_state(
        model, rng, jnp.zeros((1,) + lr0.shape, jnp.float32), tx_g,
        ema_decay=ema_decay,
    )
    d_state = create_train_state(
        discriminator,
        jax.random.fold_in(rng, 1),
        jnp.zeros((1,) + hr0.shape[1:], jnp.float32),
        tx_d,
    )

    g_state, start_epoch = restore_generator(g_state, tcfg)

    perceptual = (
        PerceptualLoss(weight=float(tcfg.perceptual_loss.get("weight", 1e-2)))
        if tcfg.get("perceptual_loss")
        else None
    )
    adv_weight = float(tcfg.get("adversarial_loss", {}).get("weight", 2e-5))
    freeze_epochs = int(tcfg.get("freeze_epochs", -1))

    logger = build_logger(tcfg.get("logger")) if process_index() == 0 else None
    keep = int(tcfg.get("checkpoint_max_to_keep", 3))
    ckpt = CheckpointManager(
        tcfg.get("checkpoint_dir", "./checkpoints"), max_to_keep=keep
    )
    ema_ckpt = (
        # same retention as the main manager — mismatched pruning would
        # desync the paired main/ema keys load_test_model aligns on
        CheckpointManager(str(ckpt.directory / "ema"), max_to_keep=keep)
        if ema_decay else None
    )
    metric_names = metrics_from_config(tcfg)
    eval_step = make_eval_step(model, metrics=metric_names)

    steps = {
        up: make_gan_train_step(
            model, discriminator, perceptual, adv_weight, up,
            ema_decay=ema_decay, metrics=metric_names,
        )
        for up in (True, False)
    }

    final_val: Dict[str, float] = {}
    # exception-safe teardown (reference src/train_gan.py:148-157: cleanup
    # + wandb.finish on any failure, then re-raise) — matches train.run
    try:
        final_val = _gan_loop(
            cfg, mesh, g_state, d_state, train_dl, val_dl, steps, eval_step,
            freeze_epochs, logger, ckpt, ema_ckpt, start_epoch,
        )
    finally:
        if logger:
            logger.close()
        ckpt.close()
        if ema_ckpt is not None:
            ema_ckpt.close()
    return final_val


def _gan_loop(
    cfg, mesh, g_state, d_state, train_dl, val_dl, steps, eval_step,
    freeze_epochs, logger, ckpt, ema_ckpt, start_epoch,
):
    tcfg = cfg.train
    final_val: Dict[str, float] = {}
    with mesh:
        g_state = jax.device_put(g_state, replicated(mesh))
        d_state = jax.device_put(d_state, replicated(mesh))
        for epoch in range(start_epoch, int(tcfg.get("max_epochs", 1))):
            t0 = time.time()
            train_dl.set_epoch(epoch)
            step = steps[epoch > freeze_epochs]
            sums: Dict[str, float] = {}
            nb = 0
            for batch in train_dl:
                g_state, d_state, metrics = step(g_state, d_state, batch)
                _accumulate(sums, metrics)
                nb += 1
            train_metrics = _mean_metrics(sums, nb)
            if logger:
                logger.log_dict(train_metrics, epoch, "Train")
            print(
                f"epoch {epoch}: "
                + " ".join(f"{k}={v:.4f}" for k, v in train_metrics.items())
                + f" ({time.time() - t0:.1f}s)"
            )

            if val_dl is not None:
                vsums, vn = {}, 0
                eval_params = (
                    g_state.ema_params if g_state.ema_params is not None
                    else g_state.params
                )
                for batch in val_dl:
                    vmetrics, _ = eval_step(eval_params, batch)
                    _accumulate(vsums, vmetrics)
                    vn += 1
                if vn:
                    final_val = _mean_metrics(vsums, vn)
                    if logger:
                        logger.log_dict(final_val, epoch, "Val")
                    print(
                        "  val: "
                        + " ".join(f"{k}={v:.4f}" for k, v in final_val.items())
                    )
            # collective: every process calls the orbax save (it gates
            # the actual IO internally); p0-only gating would deadlock
            # multi-host runs
            ckpt.save(
                epoch,
                jax.device_get(g_state.params),
                jax.device_get(g_state.opt_state),
                extra=None,
                config=cfg.to_dict(),
            )
            if ema_ckpt is not None:
                ema_ckpt.save(epoch, jax.device_get(g_state.ema_params))

    return final_val


def main(argv=None):
    overrides = list(sys.argv[1:] if argv is None else argv)
    from vsrlab_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(overrides=overrides)
    return run(cfg)


if __name__ == "__main__":
    main()
