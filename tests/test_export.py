"""AOT export tests (evaluation/export.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_ema import _fake_run_dir, tiny_state


def test_export_roundtrip_matches_model(tmp_path, rng):
    from vsrlab_tpu.evaluation.export import export_model, load_exported
    from vsrlab_tpu.evaluation.harness import load_test_model

    _, state = tiny_state()
    d = _fake_run_dir(tmp_path, state.params, main_keys=[0], ema_keys=[])
    art = tmp_path / "m.jaxexp"
    n = export_model(str(d), str(art), window_size=3, height=8, width=8)
    assert n > 0 and art.stat().st_size == n

    forward = load_exported(str(art))
    clip = jnp.asarray(rng.random((1, 3, 8, 8, 3)), jnp.float32)
    sr = forward(clip)
    assert sr.shape == (1, 3, 32, 32, 3)

    model, params, _ = load_test_model(str(d))
    ref, _ = model.apply({"params": params}, clip)
    np.testing.assert_allclose(
        np.asarray(sr), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


def test_export_cli(tmp_path):
    from vsrlab_tpu.evaluation.export import main

    _, state = tiny_state()
    d = _fake_run_dir(tmp_path, state.params, main_keys=[0], ema_keys=[])
    out = tmp_path / "cli.jaxexp"
    main([
        "--cfg-dir", str(d), "--output", str(out),
        "--window-size", "2", "--height", "8", "--width", "8",
    ])
    assert out.exists() and out.stat().st_size > 0
