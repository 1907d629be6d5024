"""Supervised VSR trainer CLI.

The TPU-native rebuild of ``python train.py +experiment=basic``
(reference src/train.py:52-130):

* config composed from ``conf/`` with experiment overlays and dotted
  overrides (``python -m vsrlab_tpu.train.train +experiment=synthetic``);
* one jitted SPMD train step (forward + cleaning loss + grad-accum +
  clip + update + on-device metrics) over a ``data`` mesh axis;
* per-epoch eval, JSONL/wandb logging, orbax checkpoints with
  restore / restore_opt / finetune semantics;
* process-0 gating for logging and checkpoint side effects.
"""

from __future__ import annotations

import sys
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

import vsrlab_tpu.components  # noqa: F401  (populates the registry)
from vsrlab_tpu.core.checkpoint import CheckpointManager
from vsrlab_tpu.core.config import Config, load_config
from vsrlab_tpu.core.loggers import build_logger
from vsrlab_tpu.parallel import create_mesh, process_index, replicated, shard_batch
from vsrlab_tpu.train.builders import build_loaders, build_model, build_tx
from vsrlab_tpu.train.state import create_train_state
from vsrlab_tpu.train.step import (
    make_eval_step,
    make_supervised_train_step,
    metrics_from_config,
)


def _mean_metrics(sums: Dict[str, float], count: int) -> Dict[str, float]:
    # the single host sync point: device scalars accumulated lazily in
    # _accumulate are read back once per epoch, not once per batch
    return {k: float(v) / max(count, 1) for k, v in sums.items()}


def _accumulate(sums: Dict[str, float], metrics) -> Dict[str, float]:
    """Accumulate metric sums WITHOUT a host readback: ``float(v)`` per
    batch would block on the step and forfeit async dispatch (the
    on-device-metrics design of train/step.py); device scalars add
    lazily and ``_mean_metrics`` syncs once per epoch."""
    for k, v in metrics.items():
        sums[k] = sums.get(k, 0.0) + v
    return sums


def _load_ema_params(restore_dir: str, key: int, template):
    """Load the EMA shadow a run saved under ``<run>/ema`` at checkpoint
    ``key``. Raises FileNotFoundError when the run kept no EMA at all.

    When the sidecar exists but lacks ``key`` (a crash in the window
    between the paired main/ema saves), falls back to the NEAREST key
    ≤ ``key`` with a loud warning — discarding the whole averaging
    history over a one-key lag would be far worse. A shadow from a
    NEWER point than the restored weights is never silently paired
    (that would fine-tune step-K weights with a later average); if the
    sidecar only has newer keys, raises FileNotFoundError so the caller
    seeds from the restored weights instead."""
    from pathlib import Path

    ema_dir = Path(restore_dir) / "ema"
    if not ema_dir.is_dir():
        raise FileNotFoundError(f"no EMA sidecar under {restore_dir}")
    mgr = CheckpointManager(str(ema_dir))
    try:
        keys = mgr.all_keys()
        if not keys:
            raise FileNotFoundError(f"empty EMA sidecar under {restore_dir}")
        older = [k for k in keys if k <= key]
        if not older:
            raise FileNotFoundError(
                f"{ema_dir} only has keys newer than {key} "
                f"({keys}) — refusing to pair step-{key} weights with a "
                "later average"
            )
        use = older[-1]
        if use != key:
            print(
                f"WARNING: {ema_dir} has no checkpoint @ key {key} "
                f"(interrupted between paired saves?) — using its nearest "
                f"older key {use} instead"
            )
        _, payload = mgr.restore(epoch=use, template={"params": template})
    finally:
        mgr.close()
    return payload["params"]


def _restore_ema(state, restore_dir: str, key: int):
    """Load the EMA shadow saved by an EMA-enabled run (sidecar manager
    under ``<run>/ema``); seed from the restored params when the source
    run had no EMA (e.g. finetuning a non-EMA checkpoint)."""
    try:
        return state.replace(
            ema_params=_load_ema_params(restore_dir, key, state.ema_params)
        )
    except FileNotFoundError:
        print(
            f"note: no EMA sidecar under {restore_dir} — seeding the EMA "
            "shadow from the restored weights"
        )
        from vsrlab_tpu.train.state import copy_params

        return state.replace(ema_params=copy_params(state.params))


def restore_state(
    state,
    tcfg,
    ckpt: CheckpointManager,
    ckpt_dir: str,
    steps_per_epoch: Optional[int] = None,
):
    """Apply the reference's restore / restore_opt / finetune semantics
    (src/core/utils.py:106-123): any ``restore`` loads weights and resumes
    at ``epoch + 1``; ``restore_opt`` additionally loads optimizer state;
    ``finetune`` resets the epoch counter to 0 regardless.

    Step-granular extension (beyond the reference): checkpoints written
    with ``save_every_steps`` carry a ``meta_<key>.json`` sidecar
    recording ``{epoch, batch_in_epoch, steps_per_epoch}``; restoring one
    resumes INSIDE that epoch, skipping the already-consumed batches
    (the loader's shuffle order is a pure function of (seed, epoch), so
    the continued stream is byte-identical to an uninterrupted run).

    Returns ``(state, start_epoch, start_batch)``.
    """
    start_epoch, start_batch = 0, 0
    if tcfg.get("restore"):
        src = CheckpointManager(tcfg.restore) if tcfg.restore != ckpt_dir else ckpt
        key, payload = src.restore(
            epoch=tcfg.get("restore_step"),  # None -> latest
            template={"params": state.params, "opt_state": state.opt_state},
        )
        state = state.replace(params=payload["params"])
        if tcfg.get("restore_ema"):
            # start from the source run's EMA average instead of its raw
            # weights (the better fine-tune init when the run kept one)
            state = state.replace(
                params=_load_ema_params(tcfg.restore, key, state.params)
            )
        if state.ema_params is not None:
            state = _restore_ema(state, tcfg.restore, key)
        meta = src.load_meta(key)
        if meta is not None:  # step-keyed checkpoint
            epoch = int(meta["epoch"])
            k, n = int(meta["batch_in_epoch"]), int(meta["steps_per_epoch"])
            if steps_per_epoch is not None and n != steps_per_epoch:
                raise ValueError(
                    f"mid-epoch resume needs the same batch stream: "
                    f"checkpoint was saved with {n} steps/epoch but the "
                    f"current loaders yield {steps_per_epoch} (batch size "
                    "or dataset changed — use finetune instead)"
                )
            start_epoch, start_batch = (epoch + 1, 0) if k >= n else (epoch, k)
        else:  # legacy epoch-keyed checkpoint
            epoch = key
            start_epoch = epoch + 1
        if tcfg.get("restore_opt"):
            # state.step counts optimizer updates; reconstruct the global
            # step from the checkpoint position when the stream geometry
            # is known (meta or current loaders), else keep the old
            # epoch-as-step approximation
            if meta is not None:
                gstep = int(meta["epoch"]) * int(meta["steps_per_epoch"]) + int(
                    meta["batch_in_epoch"]
                )
            elif steps_per_epoch is not None:
                gstep = (epoch + 1) * steps_per_epoch
            else:
                gstep = epoch
            state = state.replace(opt_state=payload["opt_state"], step=gstep)
        if tcfg.get("finetune"):
            start_epoch, start_batch = 0, 0
            print("finetuning mode")
        print(
            f"restored checkpoint @ key {key} from {tcfg.restore}; "
            f"resuming from epoch {start_epoch}, batch {start_batch}"
        )
    return state, start_epoch, start_batch


def run(cfg: Config) -> Dict[str, float]:
    """Train per config; returns final val metrics (for tests)."""
    from vsrlab_tpu.utils import seed_index_everything

    rng = seed_index_everything(cfg)

    tcfg = cfg.train
    mesh = create_mesh() if tcfg.get("ddp", True) else create_mesh(1)
    n_data = mesh.shape["data"]

    model = build_model(tcfg.model, tcfg.get("precision", "fp32"))
    tx = build_tx(
        tcfg.optimizer, tcfg.get("scheduler"), tcfg.get("gradient_clip_val"),
        skip_nonfinite=int(tcfg.get("skip_nonfinite", 0) or 0),
    )

    num_grad_acc = int(tcfg.get("num_grad_acc", 1))
    train_dl, val_dl = build_loaders(
        tcfg.data,
        num_grad_acc=num_grad_acc,
        device_put=lambda b: shard_batch(b, mesh),
        num_shards=jax.process_count(),
        shard_index=jax.process_index(),
        seed=int(cfg.get("seed_index") or 0),
    )

    # example input from the dataset's first sample (shapes only)
    lr0, _ = train_dl.dataset[0]
    example = jnp.zeros((1,) + lr0.shape, jnp.float32)
    # EMA of params (beyond reference; standard VSR practice): decay 0
    # disables, typical values 0.999-0.9999
    ema_decay = float(tcfg.get("ema_decay", 0.0))
    state = create_train_state(model, rng, example, tx, ema_decay=ema_decay)

    # restore / finetune (reference src/core/utils.py:106-135)
    ckpt_dir = tcfg.get("checkpoint_dir", "./checkpoints")
    ckpt = CheckpointManager(
        ckpt_dir, max_to_keep=int(tcfg.get("checkpoint_max_to_keep", 3))
    )
    state, start_epoch, start_batch = restore_state(
        state, tcfg, ckpt, ckpt_dir, steps_per_epoch=len(train_dl)
    )

    logger = build_logger(tcfg.get("logger")) if process_index() == 0 else None

    metric_names = metrics_from_config(tcfg)
    train_step = make_supervised_train_step(
        model, num_grad_accum=num_grad_acc, ema_decay=ema_decay,
        metrics=metric_names,
        log_grad_norm=bool(tcfg.get("log_grad_norm", False)),
    )
    eval_step = make_eval_step(model, metrics=metric_names)
    ema_ckpt = (
        CheckpointManager(
            str(ckpt.directory / "ema"),
            max_to_keep=int(tcfg.get("checkpoint_max_to_keep", 3)),
        )
        if ema_decay
        else None
    )

    # exception-safe teardown (reference src/train.py:124-130: cleanup +
    # wandb.finish on any failure, then re-raise)
    try:
        final_val = _train_loop(
            cfg, mesh, state, train_dl, val_dl, train_step, eval_step,
            logger, ckpt, start_epoch, start_batch, ema_ckpt=ema_ckpt,
        )
    finally:
        if logger:
            logger.close()
        ckpt.close()
        if ema_ckpt is not None:
            ema_ckpt.close()
    return final_val


def _train_loop(
    cfg, mesh, state, train_dl, val_dl, train_step, eval_step, logger, ckpt,
    start_epoch, start_batch=0, ema_ckpt=None,
):
    tcfg = cfg.train
    with mesh:
        state = jax.device_put(state, replicated(mesh))
        final_val: Dict[str, float] = {}
        max_epochs = int(tcfg.get("max_epochs", 1))
        eval_every = int(tcfg.get("eval_every", 1))
        # step-granular checkpointing (beyond reference): when set, ALL
        # checkpoint keys are global steps with a meta sidecar so a
        # restore resumes mid-epoch on the exact next batch
        save_every = int(tcfg.get("save_every_steps", 0))
        spe = len(train_dl)  # steps per epoch

        for epoch in range(start_epoch, max_epochs):
            t0 = time.time()
            train_dl.set_epoch(epoch)
            nb = 0
            if epoch == start_epoch and start_batch:
                train_dl.skip_next(start_batch)
                nb = start_batch
            sums: Dict[str, float] = {}
            nb0 = nb
            for batch in train_dl:
                state, metrics = train_step(state, batch)
                _accumulate(sums, metrics)
                nb += 1
                # NOTE: orbax saves are collective — every process must
                # call them (orbax gates the actual IO internally);
                # process-0-only gating would deadlock multi-host runs
                if (
                    save_every
                    and nb < spe
                    and (epoch * spe + nb) % save_every == 0
                ):
                    ckpt.save(
                        epoch * spe + nb,
                        jax.device_get(state.params),
                        jax.device_get(state.opt_state),
                        config=cfg.to_dict(),
                        meta={
                            "epoch": epoch,
                            "batch_in_epoch": nb,
                            "steps_per_epoch": spe,
                        },
                    )
                    if ema_ckpt is not None:
                        ema_ckpt.save(
                            epoch * spe + nb,
                            jax.device_get(state.ema_params),
                        )
            train_metrics = _mean_metrics(sums, nb - nb0)
            dt = time.time() - t0
            if logger:
                logger.log_dict(train_metrics, epoch, "Train")
            print(
                f"epoch {epoch}: "
                + " ".join(f"{k}={v:.4f}" for k, v in train_metrics.items())
                + f" ({dt:.1f}s, {nb - nb0} steps)"
            )
            if save_every:
                # epoch-boundary save happens unconditionally in step-
                # granular mode (the eval block may not run this epoch)
                ckpt.save(
                    (epoch + 1) * spe,
                    jax.device_get(state.params),
                    jax.device_get(state.opt_state),
                    config=cfg.to_dict(),
                    meta={
                        "epoch": epoch,
                        "batch_in_epoch": spe,
                        "steps_per_epoch": spe,
                    },
                )
                if ema_ckpt is not None:
                    ema_ckpt.save(
                        (epoch + 1) * spe, jax.device_get(state.ema_params)
                    )

            if val_dl is not None and (epoch % eval_every == 0 or epoch == max_epochs - 1):
                vsums: Dict[str, float] = {}
                vn = 0
                sr = None
                val_dl.set_epoch(epoch)
                # EMA runs validate the averaged weights — that's the
                # model that ships (and that load_test_model serves)
                eval_params = (
                    state.ema_params if state.ema_params is not None
                    else state.params
                )
                for batch in val_dl:
                    vmetrics, sr = eval_step(eval_params, batch)
                    _accumulate(vsums, vmetrics)
                    vn += 1
                if vn:
                    final_val = _mean_metrics(vsums, vn)
                    if logger:
                        logger.log_dict(final_val, epoch, "Val")
                        # lr/sr/hr grids from the last val batch
                        # (reference logger.log_images, loggers.py:36-57);
                        # multi-host global arrays span processes and
                        # cannot be read back wholesale — skip the grids
                        if getattr(batch["lr"], "is_fully_addressable", True):
                            logger.log_images(
                                epoch,
                                "Val",
                                lr=np.asarray(batch["lr"][:1]),
                                sr=np.asarray(jnp.clip(sr[:1], 0, 1)),
                                hr=np.asarray(batch["hr"][:1]),
                            )
                    print(
                        f"  val: "
                        + " ".join(f"{k}={v:.4f}" for k, v in final_val.items())
                    )
                if not save_every:
                    # legacy epoch-keyed save; in step-granular mode the
                    # epoch boundary was already saved above in the
                    # global-step key space. Collective: all processes
                    # call it (orbax gates the IO internally).
                    ckpt.save(
                        epoch,
                        jax.device_get(state.params),
                        jax.device_get(state.opt_state),
                        config=cfg.to_dict(),
                    )
                    if ema_ckpt is not None:
                        ema_ckpt.save(
                            epoch, jax.device_get(state.ema_params)
                        )
                if logger:
                    logger.save(ckpt.directory)

    return final_val


def main(argv=None):
    overrides = list(sys.argv[1:] if argv is None else argv)
    from vsrlab_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(overrides=overrides)
    return run(cfg)


if __name__ == "__main__":
    main()
