"""End-to-end trainer-loop tests (VERDICT r2 missing #1 / next #4).

Runs the actual ``run()`` of all three trainer CLIs on the synthetic
experiments (no data on disk needed), asserting finite losses, a written
checkpoint that restores, and JSONL log rows — the loop wiring
(loader integration, logger/ckpt side effects, restore, teardown) the
step-level tests can't see. Reference surfaces:
src/train.py:52-130, src/train_gan.py:60-144, src/train_spynet.py:161-254.
"""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from vsrlab_tpu.core.checkpoint import CheckpointManager
from vsrlab_tpu.core.config import load_config

pytestmark = pytest.mark.slow


def _overrides(tmp_path, experiment):
    return [
        f"+experiment={experiment}",
        f"core.storage_dir={tmp_path}",
        f"train.logger.save_dir={tmp_path}/logs",
        "train.ddp=false",
        "train.data.num_workers=0",
    ]


def _jsonl_rows(tmp_path):
    files = list(Path(tmp_path).glob("logs/**/metrics.jsonl"))
    assert files, f"no metrics.jsonl under {tmp_path}/logs"
    rows = []
    for f in files:
        rows += [json.loads(line) for line in f.read_text().splitlines()]
    return rows


def _assert_finite(metrics):
    for k, v in metrics.items():
        assert np.isfinite(v), f"non-finite {k}={v}"


class TestSupervisedLoop:
    def test_run_ckpt_logs_restore(self, tmp_path):
        from vsrlab_tpu.train.train import run

        cfg = load_config(overrides=_overrides(tmp_path, "synthetic"))
        final_val = run(cfg)
        assert final_val, "no val metrics returned"
        _assert_finite(final_val)
        assert {"Loss", "PSNR", "SSIM"} <= set(final_val)

        # checkpoint written at the last epoch and restorable
        ckpt_dir = cfg.train.checkpoint_dir
        mgr = CheckpointManager(ckpt_dir)
        epoch, payload = mgr.restore()
        mgr.close()
        assert epoch == cfg.train.max_epochs - 1
        assert all(
            np.isfinite(np.asarray(leaf)).all()
            for leaf in jax.tree.leaves(payload["params"])
        )

        # JSONL rows for both stages
        rows = _jsonl_rows(tmp_path)
        assert any("Loss/Train" in r for r in rows)
        assert any("Loss/Val" in r for r in rows)

        # resume: restore_opt continues at epoch+1 (reference
        # src/core/utils.py:106-123); one more epoch runs
        cfg2 = load_config(
            overrides=_overrides(tmp_path, "synthetic")
            + [
                f"train.restore={ckpt_dir}",
                "train.restore_opt=true",
                f"train.max_epochs={cfg.train.max_epochs + 1}",
            ]
        )
        final_val2 = run(cfg2)
        _assert_finite(final_val2)
        mgr = CheckpointManager(ckpt_dir)
        epoch2, _ = mgr.restore()
        mgr.close()
        assert epoch2 == cfg.train.max_epochs  # exactly one resumed epoch

    def test_step_granular_resume_matches_uninterrupted(self, tmp_path):
        """save_every_steps + restore_step: a run killed mid-epoch and
        resumed from the mid-epoch checkpoint reproduces the
        uninterrupted run's final params EXACTLY (deterministic loader
        stream + restored opt state). Beyond the reference, which only
        checkpoints per eval (src/core/utils.py:69-90)."""
        from vsrlab_tpu.train.train import run

        base = _overrides(tmp_path, "synthetic") + [
            "train.max_epochs=1",
            "train.data.datasets.train.num_videos=16",  # 4 batches/epoch
        ]

        # run A: uninterrupted, with mid-epoch saves every 2 steps
        cfg_a = load_config(
            overrides=base
            + [
                f"train.checkpoint_dir={tmp_path}/ckpt_a",
                "train.save_every_steps=2",
            ]
        )
        run(cfg_a)
        mgr = CheckpointManager(f"{tmp_path}/ckpt_a")
        key_end, payload_a = mgr.restore()
        assert key_end == 4  # epoch-end key in global-step space
        assert mgr.load_meta(4) == {
            "epoch": 0, "batch_in_epoch": 4, "steps_per_epoch": 4,
        }
        assert mgr.load_meta(2) == {
            "epoch": 0, "batch_in_epoch": 2, "steps_per_epoch": 4,
        }
        mgr.close()

        # run B: "crashed" after batch 2 — resume from the key-2
        # checkpoint and finish the epoch
        cfg_b = load_config(
            overrides=base
            + [
                f"train.checkpoint_dir={tmp_path}/ckpt_b",
                f"train.restore={tmp_path}/ckpt_a",
                "train.restore_step=2",
                "train.restore_opt=true",
            ]
        )
        run(cfg_b)
        mgr = CheckpointManager(f"{tmp_path}/ckpt_b")
        _, payload_b = mgr.restore()
        mgr.close()

        for a, b in zip(
            jax.tree.leaves(payload_a["params"]),
            jax.tree.leaves(payload_b["params"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestGanLoop:
    def test_run_ckpt_logs(self, tmp_path):
        from vsrlab_tpu.train.gan import run

        cfg = load_config(overrides=_overrides(tmp_path, "synthetic_gan"))
        final_val = run(cfg)
        assert final_val
        _assert_finite(final_val)

        mgr = CheckpointManager(cfg.train.checkpoint_dir)
        epoch, payload = mgr.restore()
        mgr.close()
        assert epoch == cfg.train.max_epochs - 1
        assert all(
            np.isfinite(np.asarray(leaf)).all()
            for leaf in jax.tree.leaves(payload["params"])
        )
        rows = _jsonl_rows(tmp_path)
        # generator + discriminator losses logged once unfrozen
        train_keys = set().union(*(r.keys() for r in rows))
        assert any("Train" in k for k in train_keys)

    def test_finetune_from_supervised_checkpoint(self, tmp_path):
        """The GAN entry path (reference basic_gan.yaml restore= a
        supervised run): generator weights load from a SUPERVISED
        checkpoint whose optimizer tree differs from the GAN's, with
        finetune resetting the epoch counter."""
        from vsrlab_tpu.train.gan import run as run_gan
        from vsrlab_tpu.train.train import run as run_sup

        cfg_sup = load_config(
            overrides=_overrides(tmp_path, "synthetic")
            + [f"train.checkpoint_dir={tmp_path}/sup_ckpt", "train.max_epochs=1"]
        )
        run_sup(cfg_sup)

        cfg_gan = load_config(
            overrides=_overrides(tmp_path, "synthetic_gan")
            + [
                f"train.checkpoint_dir={tmp_path}/gan_ckpt",
                f"train.restore={tmp_path}/sup_ckpt",
                "train.max_epochs=1",
            ]
        )
        # generator configs must match for the graft (synthetic_gan uses
        # the same tiny RealBasicVSR as synthetic)
        final_val = run_gan(cfg_gan)
        _assert_finite(final_val)
        mgr = CheckpointManager(f"{tmp_path}/gan_ckpt")
        epoch, payload = mgr.restore()
        mgr.close()
        assert epoch == 0  # finetune (gan.yaml default) reset the counter
        # restored supervised params actually seeded the generator:
        # compare against the supervised checkpoint's params
        mgr = CheckpointManager(f"{tmp_path}/sup_ckpt")
        _, sup_payload = mgr.restore()
        mgr.close()
        sup_leaves = jax.tree.leaves(sup_payload["params"])
        gan_leaves = jax.tree.leaves(payload["params"])
        # after 1 tiny epoch the params moved, but must still be close to
        # the supervised init (a fresh random init would differ grossly)
        deltas = [
            float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            for a, b in zip(sup_leaves, gan_leaves)
        ]
        assert max(deltas) < 0.1, deltas


class TestSpynetLoop:
    def test_progressive_curriculum(self, tmp_path):
        from vsrlab_tpu.train.spynet import run

        cfg = load_config(overrides=_overrides(tmp_path, "synthetic_spynet"))
        trained = run(cfg)
        k = int(cfg.train.k)
        assert set(trained) == {f"unit_{i}" for i in range(k)}
        for unit in trained.values():
            assert all(
                np.isfinite(np.asarray(leaf)).all()
                for leaf in jax.tree.leaves(unit)
            )

        # per-level checkpoints + combined final pyramid
        ckpt_root = Path(cfg.train.checkpoint_dir)
        for i in range(k):
            mgr = CheckpointManager(str(ckpt_root / f"level_{i}"))
            _, payload = mgr.restore()
            mgr.close()
            assert payload["params"]
        mgr = CheckpointManager(str(ckpt_root / "final"))
        _, payload = mgr.restore()
        mgr.close()
        assert set(payload["params"]) == set(trained)
