"""Config system, data pipeline, and logger tests."""

import json
from pathlib import Path

import numpy as np
import pytest

import vsrlab_tpu.components  # noqa: F401
from vsrlab_tpu.core.config import Config, instantiate, load_config
from vsrlab_tpu.data import (
    DataLoader,
    DatasetVSR,
    Mirroring,
    RandomCrop,
    RandomFlip,
    RandomJPEGCompression,
    RandomVideoCompression,
    SyntheticVSR,
)

CONF = Path(__file__).resolve().parents[1] / "conf"


class TestConfig:
    def test_compose_default(self):
        cfg = load_config(CONF)
        assert cfg.train.model._target_ == "RealBasicVSR"
        assert cfg.train.optimizer._target_ == "adam"
        # interpolation: model.upscale <- train.data.datasets.train.scale
        assert cfg.train.model.upscale == 4
        # scheduler T_max <- train.max_epochs
        assert cfg.train.scheduler.T_max == cfg.train.max_epochs

    def test_experiment_overlay(self):
        cfg = load_config(CONF, overrides=["+experiment=basic"])
        assert cfg.train.model.cleaning_blocks == 5
        assert cfg.train.data.batch_size == 32
        assert cfg.train.num_grad_acc == 4
        assert cfg.train.model.train_flow is True

    def test_dotted_overrides(self):
        cfg = load_config(
            CONF,
            overrides=["train.data.batch_size=7", "train.model.mid_channels=16"],
        )
        assert cfg.train.data.batch_size == 7
        assert cfg.train.model.mid_channels == 16

    def test_env_interpolation(self, monkeypatch):
        monkeypatch.setenv("LOGGING_DIR", "/tmp/xyz")
        cfg = load_config(CONF)
        assert cfg.core.storage_dir == "/tmp/xyz"

    def test_env_default(self, monkeypatch):
        monkeypatch.delenv("LOGGING_DIR", raising=False)
        cfg = load_config(CONF)
        assert cfg.core.storage_dir == "./logs"

    def test_root_override_processes_group_defaults(self, tmp_path):
        """A root-level `override /grp: x` must process x.yaml's own
        defaults list (previously the raw `defaults` key leaked into the
        config and sub-groups stayed unloaded)."""
        import yaml as _yaml

        conf = tmp_path / "conf"
        (conf / "grp" / "sub").mkdir(parents=True)
        (conf / "default.yaml").write_text(
            _yaml.safe_dump(
                {"defaults": [{"grp": "a"}, {"override /grp": "b"}], "x": 1}
            )
        )
        (conf / "grp" / "a.yaml").write_text(
            _yaml.safe_dump({"defaults": [{"sub": "s"}], "va": 1})
        )
        (conf / "grp" / "b.yaml").write_text(
            _yaml.safe_dump({"defaults": [{"sub": "s"}], "vb": 2})
        )
        (conf / "grp" / "sub" / "s.yaml").write_text(_yaml.safe_dump({"leaf": 3}))

        cfg = load_config(config_dir=str(conf))
        assert cfg.grp.vb == 2
        assert cfg.grp.sub.leaf == 3
        assert cfg.grp.get("defaults") is None  # consumed, not leaked

    def test_instantiate_model(self):
        cfg = load_config(CONF, overrides=["+experiment=synthetic"])
        model = instantiate(cfg.train.model)
        assert model.mid_channels == 8

    def test_reference_target_alias(self):
        model = instantiate(
            {
                "_target_": "vsrlab.vsr.models.RealBasicVSR.realbasicvsr.RealBasicVSR",
                "mid_channels": 8,
                "res_blocks": 1,
                "cleaning_blocks": 1,
            }
        )
        assert model.mid_channels == 8

    def test_unknown_target_rejected(self):
        with pytest.raises(KeyError):
            instantiate({"_target_": "os.system"})


class TestAugmentations:
    def test_jpeg_roundtrip_artifacts(self, rng):
        clip = rng.random((2, 32, 32, 3)).astype(np.float32)
        aug = RandomJPEGCompression(quality=(10, 10))
        out = aug(clip, rng)
        assert out.shape == clip.shape
        assert out.dtype == np.float32
        # heavy compression must actually change the data
        assert np.abs(out - clip).mean() > 1e-3

    def test_jpeg_quality_sampled_per_call(self):
        """Reference bug (SURVEY.md §7.4): severity frozen at init. Here
        two calls with different rng states give different outputs."""
        clip = np.random.default_rng(0).random((1, 32, 32, 3)).astype(np.float32)
        aug = RandomJPEGCompression(quality=(5, 95))
        o1 = aug(clip, np.random.default_rng(1))
        o2 = aug(clip, np.random.default_rng(2))
        assert not np.allclose(o1, o2)

    def test_video_compression(self, rng):
        clip = rng.random((5, 48, 48, 3)).astype(np.float32)
        aug = RandomVideoCompression(codec=["libx264"], crf=(28, 28), fps=(10, 10))
        out = aug(clip, rng)
        assert out.shape == clip.shape
        assert np.abs(out - clip).mean() > 1e-4

    def test_crop_flip_mirror(self, rng):
        clip = rng.random((3, 16, 16, 3)).astype(np.float32)
        cropped = RandomCrop(8)(clip, rng)
        assert cropped.shape == (3, 8, 8, 3)
        flipped = RandomFlip(p=1.0)(clip, rng)
        np.testing.assert_allclose(flipped, clip[:, :, ::-1])
        mirrored = Mirroring()(clip, rng)
        assert mirrored.shape == (6, 16, 16, 3)
        np.testing.assert_allclose(mirrored[3:], clip[::-1])


class TestDatasets:
    def test_synthetic_deterministic(self):
        ds = SyntheticVSR(num_videos=4, seq=3, height=32, width=32, scale=4)
        lr1, hr1 = ds[0]
        lr2, hr2 = ds[0]
        np.testing.assert_array_equal(hr1, hr2)
        assert hr1.shape == (3, 32, 32, 3)
        assert lr1.shape == (3, 8, 8, 3)
        assert hr1.min() >= 0 and hr1.max() <= 1

    def test_folder_dataset(self, tmp_path, rng):
        import cv2

        for v in range(3):
            d = tmp_path / f"video{v}"
            d.mkdir()
            for i in range(6):
                img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
                cv2.imwrite(str(d / f"{i:03d}.png"), img)
        ds = DatasetVSR(str(tmp_path), split="train", seq=4, train_size=0.67, scale=2)
        assert len(ds) == 2  # 3 * 0.67 -> 2 train videos
        lr, hr = ds[0]
        assert hr.shape == (4, 16, 16, 3)
        assert lr.shape == (4, 8, 8, 3)
        val = DatasetVSR(str(tmp_path), split="val", seq=4, train_size=0.67, scale=2)
        assert len(val) == 1

    def test_video_file_dataset(self, tmp_path, rng):
        """VideoDatasetVSR trains straight from encoded video files
        (beyond the reference's frame-folder-only DatasetVSR): windowed
        seek-decode, deterministic windows per (seed, epoch, index),
        split semantics, registry instantiation, loader integration."""
        from vsrlab_tpu.data import DataLoader, VideoDatasetVSR
        from vsrlab_tpu.data.video_io import write_video

        for v in range(3):
            clip = rng.random((8, 16, 16, 3)).astype(np.float32)
            write_video(tmp_path / f"vid{v}.mp4", clip, fps=8)
        ds = VideoDatasetVSR(
            str(tmp_path), split="train", seq=4, train_size=0.67, scale=2
        )
        assert len(ds) == 2
        lr, hr = ds[0]
        assert hr.shape == (4, 16, 16, 3) and lr.shape == (4, 8, 8, 3)
        assert 0.0 <= hr.min() and hr.max() <= 1.0
        lr2, hr2 = ds[0]  # same epoch -> same window
        np.testing.assert_array_equal(hr, hr2)
        assert len(VideoDatasetVSR(str(tmp_path), split="val", seq=4,
                                   train_size=0.67)) == 1

        # config-registry construction (the path trainers use)
        import vsrlab_tpu.components  # noqa: F401
        from vsrlab_tpu.core.config import instantiate

        ds_cfg = instantiate({
            "_target_": "VideoDatasetVSR", "path": str(tmp_path),
            "split": "train", "seq": 4, "train_size": 1.0, "scale": 2,
        })
        assert len(ds_cfg) == 3

        batch = next(iter(DataLoader(ds, batch_size=2, num_workers=2)))
        assert batch["lr"].shape == (2, 4, 8, 8, 3)
        assert batch["hr"].shape == (2, 4, 16, 16, 3)

    def test_val_dataset_paired_transforms_stay_aligned(self, tmp_path, rng):
        """Stochastic transforms in BOTH hr/lr pipelines must make the
        same random decisions, or paired clips misalign (reference keeps
        pairs aligned via construction-time severity,
        src/vsr/dataset.py:67-105; we keep per-call sampling AND
        alignment by cloning the generator per branch)."""
        import cv2

        from vsrlab_tpu.data.datasets import ValDatasetVSR

        for name in ("hr", "lr"):
            (tmp_path / name / "vid0").mkdir(parents=True)
        for i in range(6):
            img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
            for name in ("hr", "lr"):  # identical content in both roots
                cv2.imwrite(str(tmp_path / name / "vid0" / f"{i:03d}.png"), img)

        flip = [{"_target_": "RandomFlip", "horizontal": True, "p": 0.5}]
        ds = ValDatasetVSR(
            str(tmp_path / "hr"), str(tmp_path / "lr"), seq=4,
            hr_augmentation=flip, lr_augmentation=flip, seed=7,
        )
        for epoch in range(6):
            ds.set_epoch(epoch)
            lr, hr = ds[0]
            np.testing.assert_array_equal(lr, hr)

    def test_metric_collection_from_config(self):
        """conf/train/default.yaml's metric node instantiates and
        computes (names resolve to the built-in PSNR/SSIM)."""
        cfg = load_config()
        mc = instantiate(cfg.train.metric)
        import jax.numpy as jnp

        a = jnp.ones((1, 2, 16, 16, 3)) * 0.5
        out = mc(a, a)
        assert set(out) == {"PSNR", "SSIM"}
        assert float(out["SSIM"]) == pytest.approx(1.0, abs=1e-5)

        with pytest.raises(ValueError, match="unknown metric"):
            instantiate(
                Config.from_dict(
                    {"_target_": "MetricCollection", "metrics": ["LPIPS"]}
                )
            )

        # a bare string (YAML scalar `metrics: PSNR`) must mean ONE
        # metric, not tuple-ize into characters ('P', 'S', 'N', 'R')
        from vsrlab_tpu.core.metrics import resolve_metric_names

        assert resolve_metric_names("PSNR") == ("PSNR",)

    def test_loader_batches_and_sharding(self):
        ds = SyntheticVSR(num_videos=8, seq=2, height=16, width=16, scale=4)
        dl = DataLoader(ds, batch_size=4, num_workers=2, seed=0)
        batches = list(dl)
        assert len(batches) == 2
        assert batches[0]["lr"].shape == (4, 2, 4, 4, 3)
        assert batches[0]["hr"].shape == (4, 2, 16, 16, 3)

        # 2-shard loaders partition each global batch disjointly
        dl0 = DataLoader(ds, batch_size=4, num_shards=2, shard_index=0, seed=0)
        dl1 = DataLoader(ds, batch_size=4, num_shards=2, shard_index=1, seed=0)
        b0 = next(iter(dl0))
        b1 = next(iter(dl1))
        assert b0["hr"].shape == (2, 2, 16, 16, 3)
        assert not np.allclose(b0["hr"], b1["hr"])

    def test_loader_epoch_reshuffle(self):
        ds = SyntheticVSR(num_videos=8, seq=2, height=16, width=16, scale=4)
        dl = DataLoader(ds, batch_size=8, num_workers=2, seed=0)
        dl.set_epoch(0)
        a = next(iter(dl))["hr"]
        dl.set_epoch(1)
        b = next(iter(dl))["hr"]
        assert not np.allclose(a, b)

    def test_loader_propagates_dataset_errors(self):
        """A failing __getitem__ must raise in the consumer, not hang it
        (the producer thread previously died without its sentinel)."""

        class Exploding:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                if i == 5:
                    raise IOError("corrupt frame")
                x = np.zeros((2, 4, 4, 3), np.float32)
                return x, x

        dl = DataLoader(Exploding(), batch_size=4, shuffle=False, num_workers=2)
        with pytest.raises(IOError, match="corrupt frame"):
            list(dl)

    def test_loader_tail_batch_padded_across_shards(self):
        """drop_last=False: the tail global batch wrap-pads so every
        shard still yields a full local batch."""
        ds = SyntheticVSR(num_videos=10, seq=2, height=16, width=16, scale=4)
        shards = [
            DataLoader(
                ds, batch_size=8, drop_last=False, shuffle=False,
                num_shards=4, shard_index=i, seed=0,
            )
            for i in range(4)
        ]
        for dl in shards:
            batches = list(dl)
            assert len(batches) == 2
            assert all(b["lr"].shape[0] == 2 for b in batches)

    def test_loader_abandoned_iteration_unblocks_producer(self):
        """Breaking out of iteration early must let the producer exit
        (it previously blocked forever on a full prefetch queue)."""
        import threading
        import time

        before = threading.active_count()
        ds = SyntheticVSR(num_videos=32, seq=2, height=16, width=16, scale=4)
        dl = DataLoader(ds, batch_size=4, num_workers=2, prefetch_factor=1)
        it = iter(dl)
        next(it)
        it.close()  # generator finally -> stop.set()
        deadline = time.time() + 5.0
        while time.time() < deadline and threading.active_count() > before:
            time.sleep(0.05)
        assert threading.active_count() <= before

    def test_loader_skip_next_resumes_stream(self):
        """skip_next(k) yields exactly the full stream's tail (step-
        granular resume), and is consumed by one iteration only."""
        ds = SyntheticVSR(num_videos=16, seq=2, height=16, width=16, scale=4)
        dl = DataLoader(ds, batch_size=4, num_workers=2, seed=3)
        dl.set_epoch(2)
        full = [b["hr"] for b in dl]
        dl.skip_next(2)
        tail = [b["hr"] for b in dl]
        assert len(tail) == len(full) - 2
        for a, b in zip(full[2:], tail):
            np.testing.assert_array_equal(a, b)
        again = [b["hr"] for b in dl]  # skip consumed — full stream again
        assert len(again) == len(full)


class TestLogger:
    def test_jsonl_logger(self, tmp_path, rng):
        from vsrlab_tpu.core.loggers import JsonlLogger

        lg = JsonlLogger(save_dir=str(tmp_path), project="p", id="run1")
        lg.log_dict({"PSNR": 30.0}, epoch=1, stage="Train")
        lg.log_images(1, "Val", sr=rng.random((1, 2, 8, 8, 3)).astype(np.float32))
        lg.log_flow(1, "Train", flow=rng.random((1, 8, 8, 2)).astype(np.float32))
        lg.save("/tmp/ckpt")
        lg.close()
        lines = [
            json.loads(l)
            for l in (tmp_path / "p" / "run1" / "metrics.jsonl").read_text().splitlines()
        ]
        assert any(l.get("PSNR/Train") == 30.0 for l in lines)
        media = list((tmp_path / "p" / "run1" / "media").glob("*.png"))
        assert len(media) == 2

    def test_empty_image_batch_does_not_crash(self, tmp_path):
        from vsrlab_tpu.core.loggers import JsonlLogger

        lg = JsonlLogger(save_dir=str(tmp_path), project="p", id="run2")
        lg.log_images(0, "Val", sr=np.zeros((0, 8, 8, 3), np.float32))
        lg.close()

    def test_wandb_backend_missing_raises_clearly(self, tmp_path):
        """backend: wandb without the package must fail with a clear
        ImportError before touching the filesystem (was: NameError on the
        unbound module after opening metrics.jsonl)."""
        import vsrlab_tpu.core.loggers as loggers

        if loggers._HAS_WANDB:  # pragma: no cover — not on this box
            pytest.skip("wandb installed")
        from vsrlab_tpu.core.loggers import build_logger

        with pytest.raises(ImportError, match="wandb"):
            build_logger({"backend": "wandb", "save_dir": str(tmp_path)})
        assert not list(tmp_path.glob("**/metrics.jsonl"))
