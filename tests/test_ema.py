"""EMA (exponential-moving-average) parameter shadow tests.

``train.ema_decay`` maintains ``ema ← d·ema + (1-d)·params`` inside the
jitted train step, checkpoints the shadow under ``<run>/ema``, and
serves it from ``load_test_model`` by default — standard VSR practice
the reference lacks (its eval always uses raw weights).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vsrlab_tpu.models import RealBasicVSR
from vsrlab_tpu.train.state import create_train_state
from vsrlab_tpu.train.step import ema_update, make_supervised_train_step


def tiny_model():
    return RealBasicVSR(
        mid_channels=8, res_blocks=1, cleaning_blocks=1, cleaning_steps=1
    )


def tiny_state(ema_decay=0.0):
    model = tiny_model()
    example = jnp.zeros((1, 3, 8, 8, 3), jnp.float32)
    tx = optax.sgd(1e-2)
    return model, create_train_state(
        model, jax.random.PRNGKey(0), example, tx,
        init_jit=False, ema_decay=ema_decay,
    )


def test_state_seeds_ema_with_params():
    _, state = tiny_state(ema_decay=0.999)
    assert state.ema_params is not None
    jax.tree.map(
        lambda e, p: np.testing.assert_array_equal(
            np.asarray(e), np.asarray(p)
        ),
        state.ema_params, state.params,
    )


def test_disabled_by_default():
    _, state = tiny_state()
    assert state.ema_params is None
    # ema_update is a no-op without a shadow
    assert ema_update(state, 0.999) is state


def test_ema_update_formula(rng):
    d = 0.9
    model, state = tiny_state(ema_decay=d)
    step = make_supervised_train_step(
        model, compute_metrics=False, donate=False, ema_decay=d
    )
    batch = {
        "lr": jnp.asarray(rng.random((1, 3, 8, 8, 3)), jnp.float32),
        "hr": jnp.asarray(rng.random((1, 3, 32, 32, 3)), jnp.float32),
    }
    p0 = state.params
    new_state, _ = step(state, batch)
    expected = jax.tree.map(
        lambda e, p: e * d + p * (1 - d), p0, new_state.params
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        new_state.ema_params, expected,
    )
    # the shadow lags the live params after an update
    diffs = jax.tree.leaves(
        jax.tree.map(
            lambda e, p: float(jnp.abs(e - p).max()),
            new_state.ema_params, new_state.params,
        )
    )
    assert max(diffs) > 0


def test_ema_update_with_grad_accum(rng):
    d = 0.5
    model, state = tiny_state(ema_decay=d)
    step = make_supervised_train_step(
        model, num_grad_accum=2, compute_metrics=False, donate=False,
        ema_decay=d,
    )
    batch = {
        "lr": jnp.asarray(rng.random((2, 3, 8, 8, 3)), jnp.float32),
        "hr": jnp.asarray(rng.random((2, 3, 32, 32, 3)), jnp.float32),
    }
    p0 = state.params
    new_state, _ = step(state, batch)
    # one EMA update per optimizer step, not per microbatch
    expected = jax.tree.map(
        lambda e, p: e * d + p * (1 - d), p0, new_state.params
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        new_state.ema_params, expected,
    )


def _fake_run_dir(tmp_path, params, main_keys, ema_keys):
    """Run dir with a config snapshot, main checkpoints at ``main_keys``
    and an ema sidecar at ``ema_keys`` (scaled params so sources are
    distinguishable)."""
    from vsrlab_tpu.core.checkpoint import CheckpointManager

    cfg = {
        "train": {
            "model": {
                "_target_": "RealBasicVSR",
                "mid_channels": 8,
                "res_blocks": 1,
                "cleaning_blocks": 1,
            },
            "precision": "fp32",
        }
    }
    d = tmp_path / "run"
    mgr = CheckpointManager(str(d))
    host = jax.device_get(params)
    for k in main_keys:
        mgr.save(k, host, config=cfg)
    mgr.close()
    if ema_keys:
        ema = CheckpointManager(str(d / "ema"))
        doubled = jax.tree.map(lambda x: x * 2.0, host)
        for k in ema_keys:
            ema.save(k, doubled)
        ema.close()
    return str(d)


def test_load_test_model_rejects_stale_ema(tmp_path):
    """An ema sidecar whose latest key lags the main checkpoint must NOT
    be served (e.g. a resume with ema_decay=0 after an EMA phase)."""
    from vsrlab_tpu.evaluation.harness import load_test_model

    _, state = tiny_state()
    d = _fake_run_dir(tmp_path, state.params, main_keys=[0, 1], ema_keys=[0])
    _, served, _ = load_test_model(d)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(jnp.asarray(a)), np.asarray(b)
        ),
        served, jax.device_get(state.params),  # raw, NOT the doubled ema
    )


def test_load_test_model_serves_aligned_ema(tmp_path):
    from vsrlab_tpu.evaluation.harness import load_test_model

    _, state = tiny_state()
    d = _fake_run_dir(tmp_path, state.params, main_keys=[0, 1], ema_keys=[0, 1])
    _, served, _ = load_test_model(d)
    doubled = jax.tree.map(lambda x: x * 2.0, jax.device_get(state.params))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(jnp.asarray(a)), np.asarray(b), rtol=1e-6
        ),
        served, doubled,
    )


def test_restore_ema_falls_back_to_nearest_older_key(tmp_path):
    """A crash between the paired main/ema saves must not discard the
    averaging history: the sidecar's nearest key ≤ the requested one is
    used with a warning — but a NEWER-only sidecar must raise rather
    than silently pair old weights with a later average."""
    import pytest

    from vsrlab_tpu.train.train import _load_ema_params

    _, state = tiny_state()
    d = _fake_run_dir(tmp_path, state.params, main_keys=[0, 1], ema_keys=[0])
    loaded = _load_ema_params(d, 1, state.params)  # key 1 missing in ema/
    doubled = jax.tree.map(lambda x: x * 2.0, jax.device_get(state.params))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(jnp.asarray(a)), np.asarray(b), rtol=1e-6
        ),
        loaded, doubled,
    )

    d2 = _fake_run_dir(
        tmp_path / "newer", state.params, main_keys=[0, 5], ema_keys=[5]
    )
    with pytest.raises(FileNotFoundError, match="newer"):
        _load_ema_params(d2, 0, state.params)  # only key 5 > 0 exists


@pytest.mark.slow  # default tier: test_ema_update_formula pins the EMA
# math; the GAN trainer e2e (slow) runs the gan step with EMA end-to-end
def test_gan_step_ema(rng):
    """Generator EMA in the GAN step: updates with the generator, frozen
    when the generator is frozen (freeze_epochs phase)."""
    from vsrlab_tpu.models import UNetDiscriminator
    from vsrlab_tpu.train.gan import make_gan_train_step

    d = 0.9
    model = tiny_model()
    disc = UNetDiscriminator(mid_channels=8)
    lr = jnp.asarray(rng.random((1, 2, 8, 8, 3)), jnp.float32)
    hr = jnp.asarray(rng.random((1, 2, 32, 32, 3)), jnp.float32)
    g_state = create_train_state(
        model, jax.random.PRNGKey(0), lr, optax.adam(1e-4),
        init_jit=False, ema_decay=d,
    )
    d_state = create_train_state(
        disc, jax.random.PRNGKey(1), hr[:, 0], optax.adam(1e-4),
        init_jit=False,
    )
    batch = {"lr": lr, "hr": hr}
    p0 = g_state.params

    step = make_gan_train_step(
        model, disc, None, update_generator=True, donate=False, ema_decay=d
    )
    g2, _, _ = step(g_state, d_state, batch)
    expected = jax.tree.map(lambda e, p: e * d + p * (1 - d), p0, g2.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        g2.ema_params, expected,
    )

    frozen = make_gan_train_step(
        model, disc, None, update_generator=False, donate=False, ema_decay=d
    )
    g3, _, _ = frozen(g_state, d_state, batch)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        g3.ema_params, p0,
    )


@pytest.mark.slow
def test_trainer_ema_checkpoint_and_serving(tmp_path, rng):
    """e2e: an EMA-enabled synthetic run writes <run>/ema, serves the
    averaged weights from load_test_model, and a resumed run restores
    the shadow rather than re-seeding it."""
    from vsrlab_tpu.core.config import load_config
    from vsrlab_tpu.evaluation.harness import load_test_model
    from vsrlab_tpu.train.train import run

    overrides = [
        "+experiment=synthetic",
        f"core.storage_dir={tmp_path}",
        f"train.logger.save_dir={tmp_path}/logs",
        "train.ddp=false",
        "train.data.num_workers=0",
        "train.max_epochs=1",
        "train.ema_decay=0.5",
    ]
    cfg = load_config(overrides=overrides)
    run(cfg)
    ckpt_dir = Path(cfg.train.checkpoint_dir)
    assert (ckpt_dir / "ema").is_dir()

    model, ema_params, _ = load_test_model(str(ckpt_dir))
    _, raw_params, _ = load_test_model(str(ckpt_dir), use_ema=False)
    diffs = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max()),
            ema_params, raw_params,
        )
    )
    assert max(diffs) > 0  # the shadow genuinely lags the raw weights

    # resume: restored EMA equals the saved shadow (not re-seeded)
    cfg2 = load_config(
        overrides=overrides
        + [f"train.restore={ckpt_dir}", "train.restore_opt=true",
           "train.max_epochs=2"]
    )
    from vsrlab_tpu.core.checkpoint import CheckpointManager
    from vsrlab_tpu.train.builders import build_model, build_tx
    from vsrlab_tpu.train.state import create_train_state as cts
    from vsrlab_tpu.train.train import restore_state

    model2 = build_model(cfg2.train.model, cfg2.train.get("precision", "fp32"))
    tx = build_tx(
        cfg2.train.optimizer, cfg2.train.get("scheduler"),
        cfg2.train.get("gradient_clip_val"),
    )
    example = jnp.zeros((1, 3, 8, 8, 3), jnp.float32)
    state = cts(
        model2, jax.random.PRNGKey(1), example, tx,
        init_jit=False, ema_decay=0.5,
    )
    mgr = CheckpointManager(str(ckpt_dir))
    state, _, _ = restore_state(state, cfg2.train, mgr, str(ckpt_dir))
    mgr.close()
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(jnp.asarray(b)), rtol=1e-6, atol=1e-7
        ),
        state.ema_params, ema_params,
    )

    # restore_ema=true: the EMA average becomes the INITIAL weights
    cfg3 = load_config(
        overrides=overrides
        + [f"train.restore={ckpt_dir}", "train.restore_ema=true"]
    )
    state3 = cts(
        model2, jax.random.PRNGKey(2), example, tx, init_jit=False
    )
    mgr = CheckpointManager(str(ckpt_dir))
    state3, _, _ = restore_state(state3, cfg3.train, mgr, str(ckpt_dir))
    mgr.close()
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(jnp.asarray(b)), rtol=1e-6, atol=1e-7
        ),
        state3.params, ema_params,
    )
