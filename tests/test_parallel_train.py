"""Multi-device (8 virtual CPU) tests for the mesh + train-step layer —
the capability the torch reference structurally lacked (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vsrlab_tpu.models import BasicVSR, RealBasicVSR
from vsrlab_tpu.parallel import (
    batch_sharding,
    create_mesh,
    local_batch_slice,
    replicated,
    shard_batch,
)
from vsrlab_tpu.train import (
    create_train_state,
    make_eval_step,
    make_supervised_train_step,
)


def tiny_model():
    return RealBasicVSR(mid_channels=8, res_blocks=1, cleaning_blocks=1)


def make_batch(rng, b=8, t=3, h=8, w=8, scale=4):
    return {
        "lr": jnp.asarray(rng.random((b, t, h, w, 3)), jnp.float32),
        "hr": jnp.asarray(rng.random((b, t, h * scale, w * scale, 3)), jnp.float32),
    }


class TestMesh:
    def test_create_default(self):
        mesh = create_mesh()
        assert mesh.shape == {"data": 8}

    def test_create_2d_with_inference(self):
        mesh = create_mesh({"data": -1, "time": 2})
        assert mesh.shape == {"data": 4, "time": 2}

    def test_oversubscribed_raises(self):
        with pytest.raises(ValueError):
            create_mesh({"data": 3, "time": 3})  # 9 > 8 devices

    def test_sub_host_mesh_uses_device_prefix(self):
        # smaller-than-host meshes run on a device prefix (ddp=false on a
        # multi-device host builds a 1-device mesh)
        mesh = create_mesh({"data": 3, "time": 2})
        assert mesh.devices.size == 6
        assert create_mesh(1).devices.size == 1

    def test_shard_batch_places_on_devices(self, rng):
        mesh = create_mesh({"data": 8})
        batch = shard_batch(make_batch(rng), mesh)
        assert len(batch["lr"].sharding.device_set) == 8

    def test_local_batch_slice_single_process(self):
        assert local_batch_slice(16) == slice(0, 16)
        assert local_batch_slice(16, axis_size=4) == slice(0, 4)


class TestShardedTraining:
    def test_dp_step_matches_single_device(self, rng):
        """Data-parallel gradients must equal single-device gradients."""
        model = tiny_model()
        batch = make_batch(rng, b=8)
        tx = optax.sgd(0.1)
        state = create_train_state(model, jax.random.PRNGKey(0), batch["lr"], tx)
        step = make_supervised_train_step(model, donate=False)

        # single device
        state1, m1 = step(state, batch)

        # 8-way DP
        mesh = create_mesh({"data": 8})
        with mesh:
            state_r = jax.device_put(state, replicated(mesh))
            batch_s = shard_batch(batch, mesh)
            state8, m8 = step(state_r, batch_s)

        np.testing.assert_allclose(
            float(m1["Loss"]), float(m8["Loss"]), rtol=1e-5
        )
        l1 = jax.tree.leaves(state1.params)
        l8 = jax.tree.leaves(state8.params)
        for a, b in zip(l1, l8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_grad_accum_matches_full_batch(self, rng):
        """scan-accumulated microbatch grads == one big batch (same data)."""
        model = tiny_model()
        batch = make_batch(rng, b=4)
        tx = optax.sgd(0.1)
        state = create_train_state(model, jax.random.PRNGKey(0), batch["lr"], tx)

        s_full, m_full = make_supervised_train_step(model, donate=False)(
            state, batch
        )
        s_acc, m_acc = make_supervised_train_step(
            model, num_grad_accum=2, donate=False
        )(state, batch)

        np.testing.assert_allclose(
            float(m_full["Loss"]), float(m_acc["Loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree.leaves(s_full.params), jax.tree.leaves(s_acc.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_grad_norm_metric(self, rng):
        """log_grad_norm adds a finite positive GradNorm without
        perturbing the update, in both accum modes (and the two modes
        agree — the norm is of the post-accumulation mean gradient)."""
        model = tiny_model()
        batch = make_batch(rng, b=4)
        tx = optax.sgd(0.1)
        state = create_train_state(model, jax.random.PRNGKey(0), batch["lr"], tx)

        s_plain, _ = make_supervised_train_step(model, donate=False)(
            state, batch
        )
        s_logged, m1 = make_supervised_train_step(
            model, donate=False, log_grad_norm=True
        )(state, batch)
        _, m2 = make_supervised_train_step(
            model, donate=False, log_grad_norm=True, num_grad_accum=2
        )(state, batch)

        assert float(m1["GradNorm"]) > 0 and np.isfinite(float(m1["GradNorm"]))
        np.testing.assert_allclose(
            float(m1["GradNorm"]), float(m2["GradNorm"]), rtol=1e-4
        )
        for a, b in zip(
            jax.tree.leaves(s_plain.params), jax.tree.leaves(s_logged.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_skip_nonfinite_guards_update(self, rng):
        """build_tx(skip_nonfinite=N): a NaN gradient leaves params AND
        inner optimizer state untouched (the reference's GradScaler.step
        skip, src/core/utils.py:277); a finite gradient then applies
        normally; after N consecutive non-finite updates the NaNs
        propagate so the failure is visible."""
        import vsrlab_tpu.components  # noqa: F401 — registers "adam"
        from vsrlab_tpu.train.builders import build_tx

        cfg_opt = {"_target_": "adam", "lr": 1e-2}
        tx = build_tx(cfg_opt, None, grad_clip=1.0, skip_nonfinite=2)
        params = {"w": jnp.ones((3,))}
        opt_state = tx.init(params)

        bad = {"w": jnp.array([1.0, jnp.nan, 1.0])}
        up, opt_state = tx.update(bad, opt_state, params)
        np.testing.assert_array_equal(np.asarray(up["w"]), np.zeros(3))
        assert int(opt_state.notfinite_count) == 1

        good = {"w": jnp.ones((3,))}
        up, opt_state = tx.update(good, opt_state, params)
        assert np.isfinite(np.asarray(up["w"])).all()
        assert np.abs(np.asarray(up["w"])).sum() > 0
        assert int(opt_state.notfinite_count) == 0  # reset on success

        opt_state = tx.init(params)
        for _ in range(3):  # exceed max_consecutive_errors=2
            up, opt_state = tx.update(bad, opt_state, params)
        assert not np.isfinite(np.asarray(up["w"])).all()

    def test_loss_decreases(self, rng):
        """A few steps on a fixed batch must reduce the loss."""
        model = tiny_model()
        batch = make_batch(rng, b=2)
        tx = optax.adam(1e-3)
        state = create_train_state(model, jax.random.PRNGKey(0), batch["lr"], tx)
        step = make_supervised_train_step(model, compute_metrics=False)
        losses = []
        for _ in range(5):
            state, metrics = step(state, batch)
            losses.append(float(metrics["Loss"]))
        assert losses[-1] < losses[0]

    def test_eval_metrics_are_global_mean(self, rng):
        """Val metrics computed on a mesh-sharded batch must equal the
        unsharded global mean — the TPU-native form of the reference's
        explicit ``dist.reduce`` val-loss aggregation (src/train.py:40-41)."""
        model = tiny_model()
        batch = make_batch(rng, b=8)
        tx = optax.adam(1e-3)
        state = create_train_state(model, jax.random.PRNGKey(0), batch["lr"], tx)
        eval_step = make_eval_step(model)

        m_single, _ = eval_step(state.params, batch)

        mesh = create_mesh({"data": 8})
        with mesh:
            params_r = jax.device_put(state.params, replicated(mesh))
            batch_s = shard_batch(batch, mesh)
            m_shard, _ = eval_step(params_r, batch_s)

        for k in m_single:
            np.testing.assert_allclose(
                float(m_single[k]), float(m_shard[k]), rtol=1e-5
            )

    def test_eval_step(self, rng):
        model = tiny_model()
        batch = make_batch(rng, b=2)
        tx = optax.adam(1e-3)
        state = create_train_state(model, jax.random.PRNGKey(0), batch["lr"], tx)
        metrics, sr = make_eval_step(model)(state.params, batch)
        assert sr.shape == batch["hr"].shape
        assert np.isfinite(float(metrics["PSNR"]))


class TestSequenceParallelTraining:
    """Sequence-parallel TRAINING (VERDICT r1 #5 / SURVEY §7.1): clips
    sharded over a (data, time) mesh must train identically to a single
    device. XLA's SPMD partitioner inserts the halo exchanges (TMSA
    windows / convs across time-shard boundaries) and the scan carry
    hand-off (BasicVSR recurrence) from the input sharding alone."""

    def _run_pair(self, model, batch, rng_key=0):
        tx = optax.sgd(0.1)
        state = create_train_state(
            model, jax.random.PRNGKey(rng_key), batch["lr"], tx
        )
        step = make_supervised_train_step(model, donate=False)

        state1, m1 = step(state, batch)

        from vsrlab_tpu.parallel import shard_batch_sp

        mesh = create_mesh({"data": 2, "time": 4})
        with mesh:
            state_r = jax.device_put(state, replicated(mesh))
            batch_s = shard_batch_sp(batch, mesh)
            state8, m8 = step(state_r, batch_s)

        np.testing.assert_allclose(
            float(m1["Loss"]), float(m8["Loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree.leaves(state1.params), jax.tree.leaves(state8.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_sp_step_matches_single_device_realbasicvsr(self, rng):
        """BasicVSR recurrence: the scan carry crosses time shards."""
        self._run_pair(tiny_model(), make_batch(rng, b=2, t=4, h=8, w=8))

    @pytest.mark.slow
    def test_sp_step_matches_single_device_vrt(self, rng):
        """TMSA temporal windows straddle time-shard boundaries."""
        from vsrlab_tpu.models import TinyVRT

        model = TinyVRT(
            upscale=4, window_size=(2, 4, 4), depths=(2,) * 7,
            embed_dims=(8,) * 7, num_heads=(2,) * 7, deformable_groups=2,
            drop_path_rate=0.0,
        )
        rngs = np.random.default_rng(1)
        batch = {
            "lr": jnp.asarray(rngs.random((2, 4, 16, 16, 3)), jnp.float32),
            "hr": jnp.asarray(rngs.random((2, 4, 64, 64, 3)), jnp.float32),
        }
        self._run_pair(model, batch)

    @pytest.mark.slow
    def test_sp_step_matches_single_device_vrt_align_chunks(self, rng):
        """SP × align_chunks composition: GSPMD must shard the chunked
        alignment scan (whose frame-pair batch is assembled from
        time-sharded slices) without changing training numerics — the
        combination a long-clip, large-window production run would use."""
        from vsrlab_tpu.models import TinyVRT

        model = TinyVRT(
            upscale=4, window_size=(2, 4, 4), depths=(2,) * 7,
            embed_dims=(8,) * 7, num_heads=(2,) * 7, deformable_groups=2,
            drop_path_rate=0.0, align_chunks=4,
        )
        rngs = np.random.default_rng(2)
        batch = {
            "lr": jnp.asarray(rngs.random((2, 4, 16, 16, 3)), jnp.float32),
            "hr": jnp.asarray(rngs.random((2, 4, 64, 64, 3)), jnp.float32),
        }
        self._run_pair(model, batch)


class TestTensorParallel:
    @pytest.mark.slow  # default tier: dp×tp dryrun_multichip[2] executes TP
    def test_head_sharded_vrt_matches_unsharded(self, rng):
        """Attention heads sharded over a 'model' axis must not change
        the output (heads are independent; TP is layout only)."""
        from vsrlab_tpu.models import TinyVRT

        kw = dict(
            upscale=4, window_size=(2, 4, 4), depths=(2,) * 7,
            embed_dims=(8,) * 7, num_heads=(2,) * 7, deformable_groups=2,
            drop_path_rate=0.0,
        )
        plain = TinyVRT(**kw)
        tp = TinyVRT(**kw, head_shard_axis="model")
        x = jnp.asarray(rng.random((1, 2, 16, 16, 3)), jnp.float32)
        variables = jax.jit(plain.init)(jax.random.PRNGKey(0), x)
        want, _ = jax.jit(plain.apply)(variables, x)

        mesh = create_mesh({"data": 4, "model": 2})
        with jax.set_mesh(mesh):
            got, _ = jax.jit(tp.apply)(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestEntryContract:
    @pytest.mark.parametrize(
        "n",
        [2, pytest.param(4, marks=pytest.mark.slow), pytest.param(8, marks=pytest.mark.slow)],
    )
    def test_dryrun_multichip(self, n):
        import __graft_entry__ as g

        g.dryrun_multichip(n)

    def test_entry_compiles(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.eval_shape(fn, *args)  # trace-only: shape contract
        assert out.shape == (1, 6, 256, 256, 3)

    def test_dryrun_child_env_is_hermetic(self, monkeypatch):
        """Regression for the r4 hermetic-flags fix (VERDICT r4 #9): the
        re-exec child's XLA_FLAGS must be EXACTLY the pinned device-count
        flag — any inherited flag would change the persistent-cache key
        and turn the driver's warm dryrun into a 3-minute cold compile
        (MULTICHIP_r03) — and the compilation cache dir must be set."""
        import os
        import subprocess

        import __graft_entry__ as g

        captured = {}

        def fake_run(cmd, env=None, cwd=None, **kw):
            captured["env"] = env
            captured["cmd"] = cmd

            class P:
                returncode = 0

            return P()

        monkeypatch.setattr(subprocess, "run", fake_run)
        monkeypatch.setenv(
            "XLA_FLAGS", "--xla_dump_to=/tmp/x --xla_cpu_foo=1"
        )  # hostile inherited flags
        g._reexec_on_virtual_cpu_mesh(8)
        env = captured["env"]
        assert env["XLA_FLAGS"] == "--xla_force_host_platform_device_count=8"
        assert env["VSRLAB_DRYRUN_CHILD"] == "1"
        assert env["JAX_COMPILATION_CACHE_DIR"] == os.environ.get(
            "VSRLAB_CACHE_DIR",
            os.path.expanduser("~/.cache/vsrlab_tpu/xla"),
        )
        # the child forces the CPU platform through the config API (env
        # vars are too late on this box — CLAUDE.md)
        assert "jax.config.update('jax_platforms', 'cpu')" in captured["cmd"][-1]

    @pytest.mark.slow
    def test_dryrun_self_provisions_from_one_device(self):
        """Driver conditions (MULTICHIP_r01 regression): plain ``python -c``
        on a 1-device platform with no env prep. ``dryrun_multichip`` must
        provision its own 8-virtual-CPU mesh via subprocess re-exec."""
        import os
        import re
        import subprocess
        import sys

        env = dict(os.environ)
        # strip the conftest's 8-device provisioning → 1 CPU device, like
        # the driver's 1-chip platform
        env["XLA_FLAGS"] = re.sub(
            r"--xla_force_host_platform_device_count=\d+",
            "",
            env.get("XLA_FLAGS", ""),
        ).strip()
        env["JAX_PLATFORMS"] = "cpu"
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        proc = subprocess.run(
            [
                sys.executable,
                "-c",
                "import __graft_entry__ as g; g.dryrun_multichip(8)",
            ],
            env=env,
            cwd=repo,
            capture_output=True,
            text=True,
            timeout=2400,  # cold-cache CPU compile can take ~20 min here
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        # the child logs elapsed-time-stamped lines: "dryrun_multichip
        # [+ 15.8s] OK: mesh=..." then "... TP OK: mesh=..."
        assert "OK: mesh={'data': 4, 'time': 2}" in proc.stdout
        assert "TP OK: mesh={'data': 4, 'model': 2}" in proc.stdout
