"""Native data-loader core (libvsrio) tests: parity with the python paths."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vsrlab_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libvsrio not built"
)


class TestNativeDecode:
    def test_decode_matches_cv2(self, tmp_path, rng):
        paths = []
        for i in range(4):
            img = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
            p = tmp_path / f"{i}.png"
            cv2.imwrite(str(p), img)
            paths.append(p)
        clip = native.decode_clip(paths)
        assert clip.shape == (4, 24, 32, 3)
        want = np.stack(
            [
                cv2.imread(str(p))[..., ::-1].astype(np.float32) / 255.0
                for p in paths
            ]
        )
        np.testing.assert_allclose(clip, want, atol=1e-6)

    def test_decode_with_resize(self, tmp_path, rng):
        img = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
        p = tmp_path / "a.png"
        cv2.imwrite(str(p), img)
        clip = native.decode_clip([p, p], height=12, width=16)
        assert clip.shape == (2, 12, 16, 3)

    def test_decode_failure_raises(self, tmp_path):
        bad = tmp_path / "nope.png"
        bad.write_bytes(b"not an image")
        with pytest.raises(IOError):
            native.decode_clip([bad])

    def test_native_size_mode_rejects_mixed_resolutions(self, tmp_path, rng):
        """C-API contract: out_h/out_w == 0 means all frames share frame
        0's size; a mismatched frame must FAIL (1-based index), not write
        out of bounds at its self-sized offset."""
        import ctypes

        a = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
        b = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        pa, pb = tmp_path / "a.png", tmp_path / "b.png"
        cv2.imwrite(str(pa), a)
        cv2.imwrite(str(pb), b)

        lib = native._load()
        out = np.empty((2, 8, 8, 3), np.float32)
        arr = (ctypes.c_char_p * 2)(str(pa).encode(), str(pb).encode())
        rc = lib.vsrio_decode_clip(arr, 2, native._fptr(out), 0, 0, 2)
        assert rc == 2  # second frame mismatches frame 0's native size


class TestNativeOps:
    def test_bicubic_matches_cv2(self, rng):
        clip = rng.random((3, 32, 32, 3)).astype(np.float32)
        got = native.bicubic_resize(clip, 8, 8)
        want = np.clip(
            np.stack(
                [cv2.resize(f, (8, 8), interpolation=cv2.INTER_CUBIC) for f in clip]
            ),
            0.0,
            1.0,
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_jpeg_matches_cv2_roundtrip(self, rng):
        clip = rng.random((2, 32, 32, 3)).astype(np.float32)
        got = native.jpeg_degrade(clip, 50)

        def py_jpeg(frame):
            u8 = np.clip(np.rint(np.clip(frame, 0, 1) * 255), 0, 255).astype(np.uint8)
            ok, buf = cv2.imencode(
                ".jpg", u8[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 50]
            )
            return cv2.imdecode(buf, cv2.IMREAD_COLOR)[..., ::-1].astype(np.float32) / 255.0

        want = np.stack([py_jpeg(f) for f in clip])
        np.testing.assert_allclose(got, want, atol=1e-2)  # encoder rounding
        # and it actually degrades
        assert np.abs(got - clip).mean() > 1e-3
