"""DCT-residual codec emulator: the degradation severity knob must be real
(round-1's cv2 quality knob was measured to be a no-op —
docs/degradation_calibration.md)."""

import numpy as np

from vsrlab_tpu.data.augmentations import RandomVideoCompression
from vsrlab_tpu.data.codec_emulator import crf_to_quality, dct_codec_roundtrip


def _psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def _clip(rng, t=6, h=24, w=40):
    """Smooth-ish content (pure noise defeats any codec)."""
    import cv2

    base = rng.random((t, h // 4, w // 4, 3)).astype(np.float32)
    return np.stack(
        [cv2.resize(f, (w, h), interpolation=cv2.INTER_CUBIC) for f in base]
    ).clip(0, 1)


def test_shape_dtype_and_nonmultiple_sizes(rng):
    clip = _clip(rng, t=3, h=21, w=35)  # not multiples of 16
    out = dct_codec_roundtrip(clip, 50.0)
    assert out.shape == clip.shape
    assert out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_high_quality_near_lossless(rng):
    clip = _clip(rng)
    out = dct_codec_roundtrip(clip, 100.0, subsample_chroma=False)
    assert _psnr(out, clip) > 35.0


def test_severity_monotone_in_crf(rng):
    clip = _clip(rng)
    psnrs = [
        _psnr(dct_codec_roundtrip(clip, crf_to_quality(crf)), clip)
        for crf in (18, 28, 40)
    ]
    assert psnrs[0] > psnrs[1] > psnrs[2], psnrs
    assert psnrs[0] - psnrs[2] > 4.0  # the knob spans a real range


def test_crf_mapping_monotone():
    qs = [crf_to_quality(c) for c in range(15, 52)]
    assert all(a >= b for a, b in zip(qs, qs[1:]))
    assert qs[0] > 80 and qs[-1] == 2.0


def test_p_frames_accumulate_error(rng):
    """Inter coding: a later P-frame in the GOP must not be cleaner than
    the I-frame (error propagates through reconstruction references)."""
    clip = np.repeat(_clip(rng, t=1), 6, axis=0)  # static scene
    out = dct_codec_roundtrip(clip, 30.0, gop=6)
    i_err = float(np.abs(out[0] - clip[0]).mean())
    p_err = float(np.abs(out[5] - clip[5]).mean())
    assert p_err >= i_err * 0.5  # P-frames inherit I-frame error (static)


def test_gop_zero_clamped(rng):
    """gop<=0 must not ZeroDivisionError (numpy) or SIGFPE (native int mod);
    it clamps to all-intra (ADVICE r2)."""
    clip = _clip(rng, t=3)
    out = dct_codec_roundtrip(clip, 50.0, gop=0)
    ref = dct_codec_roundtrip(clip, 50.0, gop=1)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_native_matches_numpy_reference(rng):
    """The C++ fast path (libvsrio.vsrio_codec_degrade) must match the
    numpy semantic reference to float noise, across gop/subsample/quality
    settings and non-multiple-of-16 sizes."""
    from vsrlab_tpu.data import native

    if not (native.available() and native.codec_degrade(
        np.zeros((1, 16, 16, 3), np.float32), 50.0
    ) is not None):
        import pytest

        pytest.skip("native codec not available")
    clip = _clip(rng, t=5, h=21, w=35)
    for q, gop, ss in [(30.0, 4, True), (85.0, 8, False), (5.0, 2, True)]:
        a = dct_codec_roundtrip(clip, q, gop=gop, subsample_chroma=ss)
        b = dct_codec_roundtrip(
            clip, q, gop=gop, subsample_chroma=ss, force_numpy=True
        )
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_random_video_compression_severity_per_call(rng):
    """The augmentation must produce different degradations for different
    rng states (reference bug §7.4: severity frozen at init)."""
    clip = _clip(rng)
    aug = RandomVideoCompression(crf=(18, 35), fps=(10, 30))
    o1 = aug(clip, np.random.default_rng(1))
    o2 = aug(clip, np.random.default_rng(5))
    assert o1.shape == clip.shape
    assert not np.allclose(o1, o2)
