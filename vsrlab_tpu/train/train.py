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
from vsrlab_tpu.train.step import make_eval_step, make_supervised_train_step


def _mean_metrics(sums: Dict[str, float], count: int) -> Dict[str, float]:
    return {k: v / max(count, 1) for k, v in sums.items()}


def _accumulate(sums: Dict[str, float], metrics) -> Dict[str, float]:
    for k, v in metrics.items():
        sums[k] = sums.get(k, 0.0) + float(v)
    return sums


def restore_state(state, tcfg, ckpt: CheckpointManager, ckpt_dir: str):
    """Apply the reference's restore / restore_opt / finetune semantics
    (src/core/utils.py:106-123): any ``restore`` loads weights and resumes
    at ``epoch + 1``; ``restore_opt`` additionally loads optimizer state;
    ``finetune`` resets the epoch counter to 0 regardless.

    Returns ``(state, start_epoch)``.
    """
    start_epoch = 0
    if tcfg.get("restore"):
        src = CheckpointManager(tcfg.restore) if tcfg.restore != ckpt_dir else ckpt
        epoch, payload = src.restore(
            template={"params": state.params, "opt_state": state.opt_state}
        )
        state = state.replace(params=payload["params"])
        start_epoch = epoch + 1
        if tcfg.get("restore_opt"):
            state = state.replace(opt_state=payload["opt_state"], step=epoch)
        if tcfg.get("finetune"):
            start_epoch = 0
            print("finetuning mode")
        print(
            f"restored checkpoint @ epoch {epoch} from {tcfg.restore}; "
            f"resuming from epoch {start_epoch}"
        )
    return state, start_epoch


def run(cfg: Config) -> Dict[str, float]:
    """Train per config; returns final val metrics (for tests)."""
    from vsrlab_tpu.utils import seed_index_everything

    rng = seed_index_everything(cfg)

    tcfg = cfg.train
    mesh = create_mesh() if tcfg.get("ddp", True) else create_mesh(1)
    n_data = mesh.shape["data"]

    model = build_model(tcfg.model, tcfg.get("precision", "fp32"))
    tx = build_tx(
        tcfg.optimizer, tcfg.get("scheduler"), tcfg.get("gradient_clip_val")
    )

    num_grad_acc = int(tcfg.get("num_grad_acc", 1))
    train_dl, val_dl = build_loaders(
        tcfg.data,
        num_grad_acc=num_grad_acc,
        device_put=lambda b: shard_batch(b, mesh),
        num_shards=jax.process_count(),
        shard_index=jax.process_index(),
    )

    # example input from the dataset's first sample (shapes only)
    lr0, _ = train_dl.dataset[0]
    example = jnp.zeros((1,) + lr0.shape, jnp.float32)
    state = create_train_state(model, rng, example, tx)

    # restore / finetune (reference src/core/utils.py:106-135)
    ckpt_dir = tcfg.get("checkpoint_dir", "./checkpoints")
    ckpt = CheckpointManager(ckpt_dir)
    state, start_epoch = restore_state(state, tcfg, ckpt, ckpt_dir)

    logger = build_logger(tcfg.get("logger")) if process_index() == 0 else None

    train_step = make_supervised_train_step(model, num_grad_accum=num_grad_acc)
    eval_step = make_eval_step(model)

    # exception-safe teardown (reference src/train.py:124-130: cleanup +
    # wandb.finish on any failure, then re-raise)
    try:
        final_val = _train_loop(
            cfg, mesh, state, train_dl, val_dl, train_step, eval_step,
            logger, ckpt, start_epoch,
        )
    finally:
        if logger:
            logger.close()
        ckpt.close()
    return final_val


def _train_loop(
    cfg, mesh, state, train_dl, val_dl, train_step, eval_step, logger, ckpt,
    start_epoch,
):
    tcfg = cfg.train
    with mesh:
        state = jax.device_put(state, replicated(mesh))
        final_val: Dict[str, float] = {}
        max_epochs = int(tcfg.get("max_epochs", 1))
        eval_every = int(tcfg.get("eval_every", 1))

        for epoch in range(start_epoch, max_epochs):
            t0 = time.time()
            train_dl.set_epoch(epoch)
            sums: Dict[str, float] = {}
            nb = 0
            for batch in train_dl:
                state, metrics = train_step(state, batch)
                _accumulate(sums, metrics)
                nb += 1
            train_metrics = _mean_metrics(sums, nb)
            dt = time.time() - t0
            if logger:
                logger.log_dict(train_metrics, epoch, "Train")
            print(
                f"epoch {epoch}: "
                + " ".join(f"{k}={v:.4f}" for k, v in train_metrics.items())
                + f" ({dt:.1f}s, {nb} steps)"
            )

            if val_dl is not None and (epoch % eval_every == 0 or epoch == max_epochs - 1):
                vsums: Dict[str, float] = {}
                vn = 0
                sr = None
                val_dl.set_epoch(epoch)
                for batch in val_dl:
                    vmetrics, sr = eval_step(state.params, batch)
                    _accumulate(vsums, vmetrics)
                    vn += 1
                if vn:
                    final_val = _mean_metrics(vsums, vn)
                    if logger:
                        logger.log_dict(final_val, epoch, "Val")
                        # lr/sr/hr grids from the last val batch
                        # (reference logger.log_images, loggers.py:36-57)
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
                if process_index() == 0:
                    ckpt.save(
                        epoch,
                        jax.device_get(state.params),
                        jax.device_get(state.opt_state),
                        config=cfg.to_dict(),
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
