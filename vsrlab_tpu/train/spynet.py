"""Progressive SpyNet curriculum trainer.

Capability parity with the reference ``train_spynet.py``: pyramid levels
``k = start_k .. K-1`` are trained sequentially; level ``k`` sees frame
pairs at ``GConf(k)`` size (24·2^k × 32·2^k), degraded with a per-level
codec crf ``34 − (levels−k)·4`` (reference spynet/utils.py:131-157);
previous levels form a frozen ``prev_pyramid``; the level predicts a
residual on the upsampled previous flow and regresses an L1 loss against
the teacher flow; per-level checkpoints + a final combined pyramid are
saved (reference train_spynet.py:161-254).

Reference quirks intentionally NOT replicated (SURVEY.md §7.4):
``BasicModule.forward`` NameError, the final-save missing ``os`` import,
the swapped ImageNet mean/std entries (train_spynet.py:128-130), and the
missing ×2 flow-value scaling when upsampling the previous level's flow.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

import vsrlab_tpu.components  # noqa: F401
from vsrlab_tpu.core.checkpoint import CheckpointManager
from vsrlab_tpu.core.config import Config, load_config
from vsrlab_tpu.core.loggers import build_logger
from vsrlab_tpu.core.losses import l1_loss
from vsrlab_tpu.data.flow_dataset import (
    FlowCompose,
    FlowDataset,
    FlowRandomHorizontalFlip,
    FlowRandomRotation,
    FlowRandomVerticalFlip,
    FlowResize,
    FlowVideoCompression,
    SyntheticFlowDataset,
)
from vsrlab_tpu.data.loader import DataLoader
from vsrlab_tpu.models.flow.spynet_progressive import GConf, SpyNetProgressive
from vsrlab_tpu.models.spynet import IMAGENET_MEAN, IMAGENET_STD, SpyNetBasicModule
from vsrlab_tpu.nn.blocks import IterativeRefinement
from vsrlab_tpu.ops.resize import resize_bilinear
from vsrlab_tpu.ops.warp import flow_warp
from vsrlab_tpu.parallel import create_mesh, process_index, shard_batch
from vsrlab_tpu.train.builders import build_tx
from vsrlab_tpu.train.train import _accumulate, _mean_metrics


def load_level_data(cfg, k: int, levels: int):
    """Per-level datasets (reference load_data, spynet/utils.py:131-157)."""
    h, w = GConf(k).image_size
    crf = 34 - (levels - k) * 4
    compression = FlowVideoCompression(crf=(crf, crf), fps=(12, 12))
    train_tfms = FlowCompose(
        [
            FlowResize(h, w),
            FlowRandomRotation(17, 0.5),
            FlowRandomHorizontalFlip(0.5),
            FlowRandomVerticalFlip(0.5),
        ]
    )
    val_tfms = FlowCompose([FlowResize(h, w)])

    dcfg = cfg.train.data.datasets.train
    kind = dcfg.get("_target_", "FlowDataset")
    if kind == "SyntheticFlowDataset":
        mk = lambda split, aug: SyntheticFlowDataset(
            num_samples=dcfg.get("num_samples", 16),
            height=h,
            width=w,
            split=split,
            augmentation=aug,
            compression=compression,
        )
        return mk("train", None), mk("val", None)
    train_ds = FlowDataset(
        dcfg.path, dcfg.frames_root, "train", dcfg.get("train_size", 0.9),
        augmentation=train_tfms, compression=compression,
    )
    val_ds = FlowDataset(
        dcfg.path, dcfg.frames_root, "val", dcfg.get("train_size", 0.9),
        augmentation=val_tfms, compression=compression,
    )
    return train_ds, val_ds


def make_level_step(unit, pyramid, cleaner_apply, k: int, tx, train: bool):
    """Jitted train/eval step for one pyramid level.

    pred = unit([x1, warp(x2, V), V]) + V where V is the frozen previous
    pyramid's flow upsampled ×2 (reference train_spynet.py:126-141).
    """

    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    def forward(params, prev_params, x1, x2, y):
        if cleaner_apply is not None:
            both = cleaner_apply(jnp.concatenate([x1, x2], axis=0))
            x1, x2 = jnp.split(jax.lax.stop_gradient(both), 2, axis=0)
        x1n = (x1 - mean) / std
        x2n = (x2 - mean) / std
        if k > 0:
            v = pyramid.apply(
                {"params": prev_params}, (x1n, x2n), train=True, limit_k=k
            )
            v = jax.lax.stop_gradient(v)
            h, w = x1.shape[1:3]
            v = resize_bilinear(v, (h, w), align_corners=True) * 2.0
        else:
            v = jnp.zeros_like(y)
        warped = flow_warp(x2n, v, padding_mode="border")
        pred = unit.apply(
            {"params": params}, jnp.concatenate([x1n, warped, v], axis=-1)
        ) + v
        return l1_loss(y, pred), pred

    if train:

        @jax.jit
        def step(params, opt_state, prev_params, batch):
            (loss, pred), grads = jax.value_and_grad(forward, has_aux=True)(
                params, prev_params, batch["x1"], batch["x2"], batch["flow"]
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, {"Loss": loss}

        return step

    @jax.jit
    def eval_step(params, prev_params, batch):
        loss, pred = forward(params, prev_params, batch["x1"], batch["x2"], batch["flow"])
        return {"Loss": loss}, pred

    return eval_step


class FlowLoader(DataLoader):
    """Batches (f1, f2, flow) triplets into {"x1","x2","flow"} — only the
    collate differs; the producer/consumer machinery (error propagation,
    abandoned-iteration handling) is the base DataLoader's."""

    def _collate(self, samples) -> dict:
        return {
            "x1": np.stack([s[0] for s in samples]),
            "x2": np.stack([s[1] for s in samples]),
            "flow": np.stack([s[2] for s in samples]),
        }


def train_one_level(
    cfg, k: int, trained_units: Dict, cleaner_apply, logger, mesh
) -> Dict:
    """Train pyramid level k (reference train_one_level,
    train_spynet.py:161-211); returns the trained unit params."""
    levels = int(cfg.train.k) - 1
    unit = SpyNetBasicModule()
    pyramid = SpyNetProgressive(k=int(cfg.train.k), return_levels=(k - 1,))

    h, w = GConf(k).image_size
    rngk = jax.random.PRNGKey(int(cfg.get("seed_index") or 0) + k)
    params = jax.jit(unit.init)(rngk, jnp.zeros((1, h, w, 8)))["params"]
    tx = build_tx(
        cfg.train.optimizer, cfg.train.get("scheduler"),
        cfg.train.get("gradient_clip_val"),
        skip_nonfinite=int(cfg.train.get("skip_nonfinite", 0) or 0),
    )
    opt_state = tx.init(params)

    prev_params = {f"unit_{i}": trained_units[f"unit_{i}"] for i in range(k)}
    # pad with untouched inits so the module tree is complete
    for i in range(k, int(cfg.train.k)):
        prev_params.setdefault(f"unit_{i}", jax.tree.map(jnp.zeros_like, params))

    train_ds, val_ds = load_level_data(cfg, k, levels)
    mk_loader = lambda ds, bs, shuffle: FlowLoader(
        ds, batch_size=bs, shuffle=shuffle,
        num_workers=int(cfg.train.data.get("num_workers", 2)),
        device_put=lambda b: shard_batch(b, mesh),
        num_shards=jax.process_count(), shard_index=jax.process_index(),
    )
    bs = int(cfg.train.data.batch_size)
    train_dl = mk_loader(train_ds, bs, True)
    val_dl = mk_loader(val_ds, bs, False)

    step = make_level_step(unit, pyramid, cleaner_apply, k, tx, train=True)
    eval_step = make_level_step(unit, pyramid, cleaner_apply, k, tx, train=False)

    ckpt = CheckpointManager(
        str(Path(cfg.train.get("checkpoint_dir", "./checkpoints")) / f"level_{k}")
    )
    for epoch in range(int(cfg.train.max_epochs)):
        t0 = time.time()
        train_dl.set_epoch(epoch)
        sums, nb = {}, 0
        for batch in train_dl:
            params, opt_state, metrics = step(params, opt_state, prev_params, batch)
            _accumulate(sums, metrics)
            nb += 1
        tr = _mean_metrics(sums, nb)
        vsums, vn = {}, 0
        pred = None
        for batch in val_dl:
            vmetrics, pred = eval_step(params, prev_params, batch)
            _accumulate(vsums, vmetrics)
            vn += 1
        vl = _mean_metrics(vsums, vn)
        if logger:
            logger.log_dict({f"Loss {k}": tr.get("Loss", 0.0)}, epoch, "Train")
            logger.log_dict({f"Loss {k}": vl.get("Loss", 0.0)}, epoch, "Val")
            if pred is not None:  # val split can be empty (drop_last)
                logger.log_flow(epoch, f"Val_{k}", pred=np.asarray(pred[:4]))
        print(
            f"level {k} epoch {epoch}: train={tr.get('Loss', 0):.4f} "
            f"val={vl.get('Loss', 0):.4f} ({time.time() - t0:.1f}s, {nb} steps)"
        )
        # collective orbax save: all processes call it
        ckpt.save(epoch, jax.device_get(params), jax.device_get(opt_state))
    ckpt.close()
    return params


def run(cfg: Config) -> Dict:
    """Full curriculum (reference train, train_spynet.py:213-254)."""
    mesh = create_mesh() if cfg.train.get("ddp", False) else create_mesh(1)
    logger = build_logger(cfg.train.get("logger")) if process_index() == 0 else None

    cleaner_apply = None
    if cfg.train.get("cleaner_ckpt"):
        cleaner = IterativeRefinement(
            mid_channels=int(cfg.train.cleaner.get("mid_channels", 64)),
            blocks=int(cfg.train.cleaner.get("blocks", 20)),
        )
        mgr = CheckpointManager(cfg.train.cleaner_ckpt)
        _, payload = mgr.restore()
        cparams = payload["params"]
        cleaner_apply = jax.jit(
            lambda x: cleaner.apply({"params": cparams}, x)
        )

    trained: Dict = {}
    start_k = int(cfg.train.get("start_k", 0))
    # resume: reload already-trained levels from their per-level managers
    for i in range(start_k):
        mgr = CheckpointManager(
            str(Path(cfg.train.get("checkpoint_dir", "./checkpoints")) / f"level_{i}")
        )
        _, payload = mgr.restore()
        trained[f"unit_{i}"] = payload["params"]
        mgr.close()

    with mesh:
        for k in range(start_k, int(cfg.train.k)):
            print(f"=== training pyramid level {k} ===")
            trained[f"unit_{k}"] = train_one_level(
                cfg, k, trained, cleaner_apply, logger, mesh
            )

    # final combined pyramid (reference train_spynet.py:235-252)
    final = CheckpointManager(
        str(Path(cfg.train.get("checkpoint_dir", "./checkpoints")) / "final")
    )
    final.save(0, jax.device_get(trained), config=cfg.to_dict())
    final.close()
    if logger:
        logger.close()
    return trained


def main(argv=None):
    overrides = list(sys.argv[1:] if argv is None else argv)
    from vsrlab_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(overrides=overrides)
    return run(cfg)


if __name__ == "__main__":
    main()
