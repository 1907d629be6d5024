"""scripts/acceptance.py end-to-end: the one-command weights-level
parity acceptance path (BASELINE.md north star, blocked on assets) must
WORK the day the assets appear — exercised here with a synthetic
reference-layout torch checkpoint and a tiny on-disk dataset.

Covers: checkpoint unwrap (`model_state_dict`), importer dispatch,
hr/lr paired clips AND hr-only clips (bicubic-derive protocol), the
pass/fail bar, and the blocked-asset exit code.
"""

import importlib.util
import json
import os

import cv2
import numpy as np
import pytest
import torch

from test_torch_import import synth_realbasicvsr_sd


@pytest.fixture(scope="module")
def acceptance():
    spec = importlib.util.spec_from_file_location(
        "acceptance_under_test",
        os.path.join(
            os.path.dirname(__file__), os.pardir, "scripts", "acceptance.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    """A tiny checkpoint + two-clip dataset (one paired, one hr-only)."""
    root = tmp_path_factory.mktemp("acceptance")
    rng = np.random.default_rng(0)

    ckpt = root / "ckpt.pth"
    torch.save(
        {"epoch": 3, "model_state_dict": {
            k: torch.from_numpy(v)
            for k, v in synth_realbasicvsr_sd(rng).items()
        }},
        ckpt,
    )

    def write_frames(d, frames):
        d.mkdir(parents=True)
        for i, f in enumerate(frames):
            bgr = (np.clip(f, 0, 1)[..., ::-1] * 255).astype(np.uint8)
            assert cv2.imwrite(str(d / f"{i:03d}.png"), bgr)

    t, h, w, scale = 3, 32, 32, 4
    hr_a = rng.random((t, h, w, 3)).astype(np.float32)
    lr_a = hr_a[:, ::scale, ::scale]  # any LR works; it's paired input
    write_frames(root / "data" / "clip_a" / "hr", hr_a)
    write_frames(root / "data" / "clip_a" / "lr", lr_a)
    # hr-only clip: LR is derived bicubically by the script
    write_frames(root / "data" / "clip_b", rng.random((t, h, w, 3)))
    return ckpt, root / "data"


ARGS = ["--model", "realbasicvsr", "--mid-channels", "8", "--res-blocks",
        "2", "--cleaning-blocks", "1", "--window", "2"]


def run(acceptance, capsys, argv):
    rc = acceptance.main(argv)
    out = [l for l in capsys.readouterr().out.splitlines()
           if l.startswith("{")]
    return rc, json.loads(out[-1])


def test_measures_and_applies_bar(acceptance, assets, capsys):
    ckpt, data = assets
    base = ARGS + ["--checkpoint", str(ckpt), "--data", str(data)]

    # wrong published value -> measured, delta reported, FAIL (rc 1)
    rc, out = run(acceptance, capsys, base + ["--published-psnr", "99.0"])
    assert rc == 1 and out["pass"] is False
    assert out["clips"] == 2 and np.isfinite(out["psnr"])
    measured = out["psnr"]

    # published == measured -> PASS (rc 0), delta within bar
    rc, out = run(acceptance, capsys,
                  base + ["--published-psnr", str(measured)])
    assert rc == 0 and out["pass"] is True
    assert abs(out["delta_db"]) <= out["bar_db"]
    assert out["metric_channel"] == "RGB"


def test_y_channel_protocol(acceptance, assets, capsys):
    ckpt, data = assets
    rc, out = run(acceptance, capsys, ARGS + [
        "--checkpoint", str(ckpt), "--data", str(data),
        "--published-psnr", "0", "--y",
    ])
    assert out["metric_channel"] == "Y"
    assert np.isfinite(out["psnr"]) and np.isfinite(out["ssim"])


def test_streamed_mode_measures(acceptance, assets, capsys):
    """--stream: stateful windowed inference (the upscale --stream
    serving configuration) runs through the same metric machinery."""
    ckpt, data = assets
    rc, out = run(acceptance, capsys, ARGS + [
        "--checkpoint", str(ckpt), "--data", str(data),
        "--published-psnr", "0", "--stream",
    ])
    assert out["mode"] == "streamed"
    assert np.isfinite(out["psnr"]) and np.isfinite(out["ssim"])


@pytest.mark.slow  # TinyVRT compile dominates; the RealBasicVSR
# windowed+streamed acceptance modes stay default-tier above
def test_selftest_covers_serving_matrix(acceptance, capsys):
    """VERDICT r4 #7: every serving configuration the real acceptance
    would use is exercised on synthetic assets — RealBasicVSR windowed
    AND streamed, TinyVRT windowed with chunked alignment."""
    rc = acceptance.main(["--selftest"])
    out = [l for l in capsys.readouterr().out.splitlines()
           if l.startswith("{")]
    res = json.loads(out[-1])
    assert rc == 0 and res["selftest"] is True
    for key in ("realbasicvsr_windowed_psnr", "realbasicvsr_streamed_psnr",
                "tinyvrt_chunked_align_windowed_psnr"):
        assert np.isfinite(res[key]), (key, res)


def test_blocked_exits_2(acceptance, assets, capsys):
    ckpt, data = assets
    rc, out = run(acceptance, capsys,
                  ARGS + ["--checkpoint", "/no/such.pth", "--data", str(data)])
    assert rc == 2 and "checkpoint" in out["blocked"]

    rc, out = run(acceptance, capsys, ARGS + [
        "--checkpoint", str(ckpt), "--data", "/no/such/dir",
    ])
    assert rc == 2 and "clip folders" in out["blocked"]

    # realbasicvsr has no paper PSNR: without --published-psnr the run
    # measures but reports blocked-on-target (rc 2)
    rc, out = run(acceptance, capsys,
                  ARGS + ["--checkpoint", str(ckpt), "--data", str(data)])
    assert rc == 2 and out["pass"] is None and "published" in out["note"]
