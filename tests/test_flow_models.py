"""Optical-flow subsystem tests: RAFT (pretrained golden), IRR-PWC,
progressive SpyNet, flow datasets/transforms."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsrlab_tpu.models.flow import (
    RAFT,
    GConf,
    IRRPWCNet,
    SpyNetProgressive,
    load_torch_raft,
)

RAFT_CKPT = "/root/reference/src/optical_flow/weights/raft-small.pth"


def shifted_pair(rng, h=96, w=128, dx=3, dy=2):
    import cv2

    big = cv2.GaussianBlur(
        rng.random((h + 8, w + 8, 3)).astype(np.float32), (0, 0), 2.0
    )[None]
    f1 = big[:, 4 : 4 + h, 4 : 4 + w]
    f2 = big[:, 4 - dy : 4 - dy + h, 4 - dx : 4 - dx + w]
    return f1, f2


class TestRAFT:
    @pytest.mark.skipif(not os.path.exists(RAFT_CKPT), reason="no raft ckpt")
    def test_pretrained_recovers_known_shift(self, rng):
        """Golden test: the reference's shipped raft-small.pth, imported
        into our flax RAFT, must recover a constant integer shift."""
        import torch

        f1, f2 = shifted_pair(rng, dx=3, dy=2)
        model = RAFT(small=True, scale_factor=8)
        params = load_torch_raft(
            torch.load(RAFT_CKPT, map_location="cpu"), small=True
        )
        flow = np.asarray(
            jax.jit(model.apply)(
                {"params": params}, jnp.asarray(f2), jnp.asarray(f1)
            )
        )
        inner = flow[:, 16:-16, 16:-16]
        assert abs(np.median(inner[..., 0]) - 3) < 0.5
        assert abs(np.median(inner[..., 1]) - 2) < 0.5

    @pytest.mark.slow
    def test_random_init_shapes(self, rng):
        model = RAFT(small=True, scale_factor=8, iters=2)
        x = jnp.asarray(rng.random((1, 32, 48, 3)), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
        flow = model.apply(variables, x, x)
        assert flow.shape == (1, 32, 48, 2)
        assert np.isfinite(np.asarray(flow)).all()

    @pytest.mark.slow
    def test_basic_variant_builds(self, rng):
        model = RAFT(small=False, scale_factor=2, iters=1)
        x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
        flow = model.apply(variables, x, x)
        assert flow.shape == (1, 8, 8, 2)


class TestIRR:
    @pytest.mark.slow
    def test_bidirectional_multiscale(self, rng):
        model = IRRPWCNet(return_levels=(-1, -2, -3, -4))
        x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
        y = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, y)
        flows_f, flows_b = model.apply(variables, x, y)
        assert len(flows_f) == 4 and len(flows_b) == 4
        # levels list: [1/64, 1/32, 1/16, 1/8, 1/4, 1/2, full]; [-1] = full
        assert flows_f[0].shape == (1, 64, 64, 2)
        assert flows_f[1].shape == (1, 32, 32, 2)
        assert flows_f[2].shape == (1, 16, 16, 2)
        assert flows_f[3].shape == (1, 8, 8, 2)
        for f in flows_f + flows_b:
            assert np.isfinite(np.asarray(f)).all()


class TestSpyNetProgressive:
    def test_gconf_sizes(self):
        assert GConf(0).image_size == (24, 32)
        assert GConf(3).image_size == (192, 256)

    @pytest.mark.slow  # curriculum also e2e-tested in test_trainer_e2e (slow)
    def test_curriculum_limit_k(self, rng):
        model = SpyNetProgressive(k=4, return_levels=(3,))
        f1 = jnp.asarray(rng.random((1, 192, 256, 3)), jnp.float32)
        f2 = jnp.asarray(rng.random((1, 192, 256, 3)), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), (f1, f2))
        # full pyramid at train sizes: last level -> GConf(3) size
        flow = model.apply(variables, (f1, f2), train=True)
        assert flow.shape == (1, 192, 256, 2)
        # eval sizing: level k -> full / 2^(levels-k); levels=3, k=3 -> full
        flow = model.apply(variables, (f1, f2), train=False)
        assert flow.shape == (1, 192, 256, 2)

    def test_multi_level_returns(self, rng):
        model = SpyNetProgressive(k=4, return_levels=(1, 2, 3))
        f1 = jnp.asarray(rng.random((1, 96, 128, 3)), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), (f1, f1))
        flows = model.apply(variables, (f1, f1), train=True)
        assert isinstance(flows, list) and len(flows) == 3


class TestFlowData:
    def test_synthetic_triplets(self):
        from vsrlab_tpu.data.flow_dataset import SyntheticFlowDataset

        ds = SyntheticFlowDataset(num_samples=4, height=24, width=32)
        f1, f2, flow = ds[0]
        assert f1.shape == (24, 32, 3) and flow.shape == (24, 32, 2)
        # ground truth: content at f1 position p appears at f2 position
        # p + (dx, dy), i.e. f2[p + flow] == f1[p]
        dx, dy = int(flow[0, 0, 0]), int(flow[0, 0, 1])
        m = ds.max_shift
        a = f1[m : 24 - m, m : 32 - m]
        b = f2[m + dy : 24 - m + dy, m + dx : 32 - m + dx]
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_joint_transforms(self, rng):
        from vsrlab_tpu.data.flow_dataset import (
            FlowCompose,
            FlowRandomHorizontalFlip,
            FlowResize,
        )

        frames = rng.random((2, 24, 32, 3)).astype(np.float32)
        flow = rng.random((24, 32, 2)).astype(np.float32)
        tfms = FlowCompose([FlowResize(48, 64), FlowRandomHorizontalFlip(1.0)])
        f2, fl2 = tfms(frames, flow, rng)
        assert f2.shape == (2, 48, 64, 3)
        assert fl2.shape == (48, 64, 2)

    def test_flow_dataset_from_files(self, tmp_path, rng):
        import cv2

        from vsrlab_tpu.data.flow_dataset import FlowDataset

        frames_root = tmp_path / "frames"
        flows = tmp_path / "flows"
        flows.mkdir()
        (frames_root / "vid_001").mkdir(parents=True)
        for i in (1, 2):
            img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(frames_root / "vid_001" / f"{i:04d}.png"), img)
        np.savez(
            flows / "vid_001_0001_0002.npz",
            flow=rng.random((16, 16, 2)).astype(np.float32),
        )
        ds = FlowDataset(str(flows), str(frames_root), split="all")
        f1, f2, flow = ds[0]
        assert f1.shape == (16, 16, 3) and flow.shape == (16, 16, 2)

    @pytest.mark.slow
    def test_create_flow_dataset_cli_feeds_flow_dataset(self, tmp_path, rng):
        """e2e distillation pipeline (reference create_dataset.py:11-36):
        the CLI runs the pretrained RAFT teacher over adjacent frames and
        its .npz output loads through FlowDataset."""
        import cv2

        from vsrlab_tpu.data import create_flow_dataset
        from vsrlab_tpu.data.flow_dataset import FlowDataset

        frames_root = tmp_path / "frames"
        (frames_root / "vidA").mkdir(parents=True)
        for i in range(3):
            img = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(frames_root / "vidA" / f"{i:04d}.png"), img)

        out = tmp_path / "flows"
        create_flow_dataset.main(
            [
                "--frames", str(frames_root), "--out", str(out),
                "--height", "64", "--width", "64",
            ]
        )
        files = sorted(out.glob("*.npz"))
        assert len(files) == 2  # 3 frames -> 2 adjacent pairs
        flow = np.load(files[0])["flow"]
        assert flow.shape == (64, 64, 2) and np.isfinite(flow).all()

        ds = FlowDataset(str(out), str(frames_root), split="all")
        assert len(ds) == 2
        f1, f2, fl = ds[0]
        assert f1.shape == (48, 48, 3) and fl.shape == (64, 64, 2)

    def test_distillation_pipeline_to_spynet_step(self, tmp_path, rng,
                                                  monkeypatch):
        """Default-tier e2e for the teacher-distillation pipeline
        (reference create_dataset.py:11-36 feeding train_spynet.py):
        frames on disk → CLI writes teacher flows → FlowDataset resolves
        the frame pairs → FlowLoader batches → ONE progressive-SPyNet
        level-0 train step updates the unit. The teacher here is an
        injected constant-flow stand-in so the test stays seconds-fast;
        the real pretrained-RAFT teacher variant is the slow-tier test
        above, and RAFT itself has a golden recovery test."""
        import cv2
        import optax

        from vsrlab_tpu.data import create_flow_dataset
        from vsrlab_tpu.data.flow_dataset import (
            FlowCompose,
            FlowDataset,
            FlowResize,
        )
        from vsrlab_tpu.models.spynet import SpyNetBasicModule
        from vsrlab_tpu.train.spynet import FlowLoader, make_level_step

        frames_root = tmp_path / "frames"
        (frames_root / "vidA").mkdir(parents=True)
        for i in range(3):
            img = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(frames_root / "vidA" / f"{i:04d}.png"), img)

        def fake_teacher(_ckpt=None):
            def fwd(a, b):
                h, w = a.shape[1:3]
                return jnp.full((a.shape[0], h, w, 2), 1.5, jnp.float32)

            return fwd

        monkeypatch.setattr(create_flow_dataset, "build_teacher",
                            fake_teacher)
        out = tmp_path / "flows"
        create_flow_dataset.main([
            "--frames", str(frames_root), "--out", str(out),
            "--height", "24", "--width", "32",
        ])
        assert len(sorted(out.glob("*.npz"))) == 2

        # GConf(0) train size is 24x32 (reference spynet/config.py:3-17)
        ds = FlowDataset(str(out), str(frames_root), split="all",
                         augmentation=FlowCompose([FlowResize(24, 32)]))
        loader = FlowLoader(ds, batch_size=2, shuffle=False, num_workers=1)
        batch = next(iter(loader))
        assert batch["x1"].shape == (2, 24, 32, 3)
        assert batch["flow"].shape == (2, 24, 32, 2)

        unit = SpyNetBasicModule()
        tx = optax.adam(1e-3)
        params = jax.jit(unit.init)(
            jax.random.PRNGKey(0), jnp.zeros((2, 24, 32, 8), jnp.float32)
        )["params"]
        opt_state = tx.init(params)
        step = make_level_step(unit, None, None, k=0, tx=tx, train=True)
        new_params, opt_state, metrics = step(params, opt_state, {}, batch)
        assert np.isfinite(float(metrics["Loss"]))
        # the step actually updated the unit
        assert any(
            not np.allclose(a, b) for a, b in zip(
                jax.tree.leaves(params), jax.tree.leaves(new_params))
        )


class TestOpticalFlowConsistency:
    @pytest.mark.slow  # multi-model compile; per-model oracles stay default
    def test_zero_at_identity(self, rng):
        from vsrlab_tpu.core.losses import OpticalFlowConsistency

        loss = OpticalFlowConsistency(weight=1.0)
        clip = jnp.asarray(rng.random((1, 2, 32, 32, 3)), jnp.float32)
        assert float(loss(clip, clip)) == 0.0
        other = jnp.asarray(rng.random((1, 2, 32, 32, 3)), jnp.float32)
        assert float(loss(clip, other)) > 0.0
