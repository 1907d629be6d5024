"""Video file IO utilities tests."""

import cv2
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vsrlab_tpu.data.video_io import (
    compress_video_folder,
    read_video,
    write_video,
)


class TestVideoIO:
    def test_write_read_roundtrip(self, tmp_path, rng):
        frames = rng.random((6, 32, 48, 3)).astype(np.float32)
        path = tmp_path / "v.mp4"
        write_video(path, frames, fps=12, crf=10)
        back, codec, fps, h, w = read_video(path)
        assert back.shape == (6, 32, 48, 3)
        assert (h, w) == (32, 48)
        assert abs(fps - 12) < 0.5
        # lossy but recognisable
        assert np.abs(back - frames).mean() < 0.2

    def test_read_window_past_end_walks_back(self, tmp_path, rng):
        """Container headers can over-report frame counts (VFR/estimated
        index), so a sampled window may seek past the last decodable
        frame: the reader must walk back toward 0 and return real frames
        instead of crashing the training run."""
        from vsrlab_tpu.data.video_io import read_video_window

        frames = rng.random((6, 32, 48, 3)).astype(np.float32)
        path = tmp_path / "v.mp4"
        write_video(path, frames, fps=12, crf=10)
        out = read_video_window(path, start=50, count=3)  # way past EOF
        assert out.shape == (3, 32, 48, 3)
        assert np.isfinite(out).all()

    def test_compress_video_folder(self, tmp_path, rng):
        hr = tmp_path / "hr"
        hr.mkdir()
        frames = rng.random((4, 32, 32, 3)).astype(np.float32)
        write_video(hr / "a.mp4", frames, fps=10, crf=5)
        compress_video_folder(tmp_path, crf=30, scale_factor=2)
        out, _, _, h, w = read_video(tmp_path / "lr_crf_30" / "a.mp4")
        assert (h, w) == (16, 16)
        assert out.shape[0] == 4

    def test_compress_video_crf_changes_severity(self, tmp_path, rng):
        """cv2's encoder quality knob is a no-op on this stack
        (docs/degradation_calibration.md), so compress_video applies crf
        severity via the calibrated codec emulator — higher crf must
        actually mean lower fidelity."""
        hr = tmp_path / "hr"
        hr.mkdir()
        # smooth content so codec error, not encode noise, dominates
        y, x = np.mgrid[0:64, 0:64] / 64.0
        frames = np.stack(
            [np.stack([y * 0.5 + x * 0.3 + t * 0.02] * 3, -1) for t in range(4)]
        ).astype(np.float32)
        write_video(hr / "a.mp4", frames, fps=10, crf=5)

        def mse_at(crf):
            compress_video_folder(tmp_path, crf=crf, scale_factor=2)
            out, _, _, _, _ = read_video(tmp_path / f"lr_crf_{crf}" / "a.mp4")
            small = np.stack(
                [cv2.resize(f, (32, 32), interpolation=cv2.INTER_AREA) for f in frames]
            )
            return float(np.mean((out - small) ** 2))

        assert mse_at(40) > 2.0 * mse_at(18)
