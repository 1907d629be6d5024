"""Video file IO utilities tests."""

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

    def test_compress_video_folder(self, tmp_path, rng):
        hr = tmp_path / "hr"
        hr.mkdir()
        frames = rng.random((4, 32, 32, 3)).astype(np.float32)
        write_video(hr / "a.mp4", frames, fps=10, crf=5)
        compress_video_folder(tmp_path, crf=30, scale_factor=2)
        out, _, _, h, w = read_video(tmp_path / "lr_crf_30" / "a.mp4")
        assert (h, w) == (16, 16)
        assert out.shape[0] == 4
