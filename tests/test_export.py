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


def test_upscale_from_artifact_matches_cfg_dir(tmp_path, rng):
    """The upscale CLI serving an AOT artifact must produce the same
    frames as serving from the run directory (same weights, same
    windowing) — the artifact is a drop-in deployment of the model."""
    import cv2

    from vsrlab_tpu.evaluation.export import export_model
    from vsrlab_tpu.evaluation.upscale import upscale

    _, state = tiny_state()
    d = _fake_run_dir(tmp_path, state.params, main_keys=[0], ema_keys=[])
    art = tmp_path / "m.jaxexp"
    export_model(str(d), str(art), window_size=2, height=8, width=8)

    frames_in = tmp_path / "frames"
    frames_in.mkdir()
    for i in range(4):
        u8 = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(frames_in / f"f{i:03d}.png"), u8)

    shape_a, _ = upscale(
        None, str(frames_in), str(tmp_path / "out_art"),
        window_size=2, artifact=str(art),
    )
    shape_m, _ = upscale(
        str(d), str(frames_in), str(tmp_path / "out_mdl"), window_size=2,
    )
    assert shape_a == shape_m == (4, 32, 32, 3)
    for i in range(4):
        a = cv2.imread(str(tmp_path / "out_art" / f"img{i:05d}.png"))
        m = cv2.imread(str(tmp_path / "out_mdl" / f"img{i:05d}.png"))
        np.testing.assert_array_equal(a, m)


def test_artifact_rejects_incompatible_flags_and_shapes(tmp_path, rng):
    import pytest

    from vsrlab_tpu.evaluation.export import export_model
    from vsrlab_tpu.evaluation.upscale import upscale

    _, state = tiny_state()
    d = _fake_run_dir(tmp_path, state.params, main_keys=[0], ema_keys=[])
    art = tmp_path / "m.jaxexp"
    export_model(str(d), str(art), window_size=2, height=8, width=8)

    with pytest.raises(ValueError, match="fixed-shape"):
        upscale(
            None, "x", str(tmp_path / "o"), artifact=str(art), stream=True
        )

    import cv2

    frames_in = tmp_path / "wrong_size"
    frames_in.mkdir()
    cv2.imwrite(
        str(frames_in / "f0.png"),
        (rng.random((16, 16, 3)) * 255).astype(np.uint8),
    )
    with pytest.raises(ValueError, match="exported at 8x8"):
        upscale(
            None, str(frames_in), str(tmp_path / "o2"),
            window_size=2, artifact=str(art),
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
