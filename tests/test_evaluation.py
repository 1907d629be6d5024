"""Eval harness + params bench tests (synthetic test matrix on disk)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

cv2 = pytest.importorskip("cv2")

from vsrlab_tpu.core.checkpoint import CheckpointManager
from vsrlab_tpu.data.datasets import SyntheticVSR
from vsrlab_tpu.evaluation.harness import (
    get_video,
    load_test_model,
    run_test_matrix,
    windowed_inference,
)
from vsrlab_tpu.evaluation.params_bench import param_count, speed_bench
from vsrlab_tpu.models import RealBasicVSR
from vsrlab_tpu.parallel import create_mesh
from vsrlab_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    """A trained-model run directory: config snapshot + orbax checkpoint."""
    d = tmp_path_factory.mktemp("run")
    model = RealBasicVSR(mid_channels=8, res_blocks=1, cleaning_blocks=1)
    lr = jnp.zeros((1, 2, 8, 8, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), lr, optax.adam(1e-4))
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
    mgr = CheckpointManager(str(d))
    mgr.save(0, jax.device_get(state.params), config=cfg)
    mgr.close()
    return str(d)


@pytest.fixture(scope="module")
def vrt_run_dir(tmp_path_factory):
    """A TinyVRT run directory (for the VRT-only align_chunks knob)."""
    from vsrlab_tpu.models import TinyVRT

    d = tmp_path_factory.mktemp("vrt_run")
    kw = dict(
        upscale=4, window_size=[2, 4, 4], depths=[2] * 7,
        embed_dims=[8] * 7, num_heads=[2] * 7, deformable_groups=2,
        drop_path_rate=0.0,
    )
    model = TinyVRT(**kw)
    lr = jnp.zeros((1, 2, 16, 16, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), lr, optax.adam(1e-4))
    cfg = {"train": {"model": {"_target_": "TinyVRT", **kw}, "precision": "fp32"}}
    mgr = CheckpointManager(str(d))
    mgr.save(0, jax.device_get(state.params), config=cfg)
    mgr.close()
    return str(d)


@pytest.fixture(scope="module")
def test_matrix(tmp_path_factory):
    """<root>/{lr,hr}/fps=F_crf=C/{frames,video}/<video>/ tiny matrix."""
    root = tmp_path_factory.mktemp("matrix")
    ds = SyntheticVSR(num_videos=1, seq=5, height=32, width=32, scale=4)
    lr_clip, hr_clip = ds[0]

    def write(base, clip):
        frames_dir = base / "frames" / "vid0"
        video_dir = base / "video"
        frames_dir.mkdir(parents=True)
        video_dir.mkdir(parents=True)
        for i, f in enumerate(clip):
            u8 = (np.clip(f, 0, 1) * 255).round().astype(np.uint8)
            cv2.imwrite(str(frames_dir / f"{i:05d}.png"), u8[..., ::-1])
        # encoded file only needed for its size
        (video_dir / "vid0").write_bytes(b"x" * 1000)

    write(root / "lr" / "fps=6_crf=30", lr_clip)
    write(root / "hr" / "fps=6_crf=5", hr_clip)
    return root


class TestHarness:
    def test_load_test_model(self, run_dir):
        model, params, cfg = load_test_model(run_dir)
        assert model.mid_channels == 8
        assert param_count(params) > 0

    def test_windowed_inference_restitch(self, run_dir, rng):
        model, params, _ = load_test_model(run_dir)
        forward = jax.jit(lambda p, x: model.apply({"params": p}, x))
        video = rng.random((1, 5, 8, 8, 3)).astype(np.float32)
        sr, n_windows = windowed_inference(forward, params, video, window_size=2)
        assert n_windows == 3  # 5 frames / window 2, padded
        assert sr.shape == (1, 5, 32, 32, 3)

    def test_windowed_inference_time_sharded(self, run_dir, rng):
        """Window batch sharded over the mesh time axis == unsharded."""
        model, params, _ = load_test_model(run_dir)
        forward = jax.jit(lambda p, x: model.apply({"params": p}, x))
        video = rng.random((1, 8, 8, 8, 3)).astype(np.float32)
        sr_plain, _ = windowed_inference(forward, params, video, 2)
        mesh = create_mesh({"data": 4, "time": 2})
        with mesh:
            sr_shard, _ = windowed_inference(forward, params, video, 2, mesh)
        np.testing.assert_allclose(
            np.asarray(sr_plain), np.asarray(sr_shard), atol=1e-5
        )

    def test_full_matrix_sweep(self, run_dir, test_matrix, tmp_path):
        df = run_test_matrix(
            run_dir,
            str(test_matrix / "lr"),
            str(test_matrix / "hr"),
            str(tmp_path / "out"),
            window_size=3,
            fps_list=(6,),
            crf_list=(30,),
        )
        assert len(df) == 1
        row = df.iloc[0]
        assert np.isfinite(row["PSNR"]) and row["PSNR"] > 0
        assert 0 <= row["SSIM"] <= 1
        assert row["cf"] > 0 and row["bpp"] > 0
        # frames dumped + csv written
        name = [p.name for p in (tmp_path / "out").iterdir()][0]
        pngs = list((tmp_path / "out").rglob("*.png"))
        assert len(pngs) == 5
        assert list((tmp_path / "out").rglob("*.csv"))

    def test_full_matrix_sweep_tiled(self, run_dir, test_matrix, tmp_path):
        """--tile path: spatially-tiled per-window forwards (official-VRT
        protocol) produce a finite, plausible sweep."""
        df = run_test_matrix(
            run_dir,
            str(test_matrix / "lr"),
            str(test_matrix / "hr"),
            str(tmp_path / "out_tiled"),
            window_size=3,
            fps_list=(6,),
            crf_list=(30,),
            save_frames=False,
            tile=6,
            tile_overlap=2,
        )
        row = df.iloc[0]
        assert np.isfinite(row["PSNR"]) and row["PSNR"] > 0
        assert 0 <= row["SSIM"] <= 1

    def test_sweep_align_chunks_matches(self, vrt_run_dir, tmp_path):
        """align_chunks (the single-pass large-input VRT knob) is a pure
        memory knob on the harness too: identical sweep metrics.

        Needs its own matrix: TinyVRT's minimum input is 16x16 (the
        U-shape's /4 downscale + SpyNet's /32-multiple internal resize
        reject 8x8 — same domain limit as the reference architecture)."""
        root = tmp_path / "matrix16"
        ds = SyntheticVSR(num_videos=1, seq=5, height=64, width=64, scale=4)
        lr_clip, hr_clip = ds[0]
        for sub, clip in (("lr", lr_clip), ("hr", hr_clip)):
            crf = 30 if sub == "lr" else 5
            fdir = root / sub / f"fps=6_crf={crf}" / "frames" / "vid0"
            fdir.mkdir(parents=True)
            for i, f in enumerate(clip):
                u8 = (np.clip(f, 0, 1) * 255).round().astype(np.uint8)
                cv2.imwrite(str(fdir / f"{i:05d}.png"), u8[..., ::-1])

        kw = dict(
            window_size=5, fps_list=(6,), crf_list=(30,), save_frames=False
        )
        base = run_test_matrix(
            vrt_run_dir, str(root / "lr"), str(root / "hr"),
            str(tmp_path / "o1"), **kw,
        )
        chunked = run_test_matrix(
            vrt_run_dir, str(root / "lr"), str(root / "hr"),
            str(tmp_path / "o2"), align_chunks=4, **kw,
        )
        np.testing.assert_allclose(
            base.iloc[0]["PSNR"], chunked.iloc[0]["PSNR"], rtol=1e-5
        )
        np.testing.assert_allclose(
            base.iloc[0]["SSIM"], chunked.iloc[0]["SSIM"], rtol=1e-5
        )


class TestUpscaleCLI:
    def test_video_file_roundtrip(self, run_dir, tmp_path, rng):
        """upscale CLI: mp4 in -> 4x mp4 out (windowed), plus the
        frame-folder output and --tile code paths."""
        from vsrlab_tpu.data.video_io import read_video, write_video
        from vsrlab_tpu.evaluation.upscale import main as upscale_main

        src = tmp_path / "in.mp4"
        write_video(src, rng.random((5, 16, 16, 3)).astype(np.float32), fps=8)

        out = tmp_path / "out.mp4"
        upscale_main([
            "--cfg-dir", run_dir, "--input", str(src), "--output", str(out),
            "--window-size", "2",
        ])
        frames, _, fps, h, w = read_video(out)
        assert (h, w) == (64, 64) and len(frames) == 5
        assert abs(fps - 8) < 0.5  # source fps preserved

        out_dir = tmp_path / "frames_out"
        upscale_main([
            "--cfg-dir", run_dir, "--input", str(src),
            "--output", str(out_dir), "--window-size", "3",
            "--tile", "12", "--tile-overlap", "4",
            # no-op on non-VRT models (hasattr guard) — must not crash
            "--align-chunks", "2",
        ])
        pngs = sorted(out_dir.glob("*.png"))
        assert len(pngs) == 5
        img = cv2.imread(str(pngs[0]))
        assert img.shape == (64, 64, 3)

    def test_iter_windows_pads_short_tail(self):
        """A short final read is padded by repeating the last frame, and
        n_real reports the true frame count."""
        from vsrlab_tpu.evaluation.upscale import _iter_windows

        frames = np.arange(5, dtype=np.float32).reshape(5, 1, 1, 1)
        frames = np.broadcast_to(frames, (5, 2, 2, 3)).copy()
        pos = 0

        def read_next(n):
            nonlocal pos
            batch = frames[pos : pos + n]
            pos += len(batch)
            return batch

        wins = list(_iter_windows(read_next, 3))
        assert [k for _, k in wins] == [3, 2]
        assert wins[0][0].shape == (1, 3, 2, 2, 3)
        # tail window: frames 3, 4, then 4 repeated
        np.testing.assert_array_equal(
            wins[1][0][0, :, 0, 0, 0], [3.0, 4.0, 4.0]
        )

    def test_prefetch_propagates_errors_and_order(self):
        """The decode thread's exception surfaces to the consumer; items
        arrive in order."""
        from vsrlab_tpu.evaluation.upscale import _prefetch

        assert list(_prefetch(iter(range(7)))) == list(range(7))

        def boom():
            yield 1
            raise IOError("decode failed")

        it = _prefetch(boom())
        assert next(it) == 1
        with pytest.raises(IOError, match="decode failed"):
            list(it)

    def test_prefetch_close_stops_worker(self):
        """Closing the prefetch generator joins the decode thread, so the
        caller can safely release the underlying source (e.g. a cv2
        capture) — no reads happen after close() returns."""
        import time as _time

        from vsrlab_tpu.evaluation.upscale import _prefetch

        reads = []

        def slow_source():
            for i in range(1000):
                reads.append(i)
                yield i

        it = _prefetch(slow_source(), depth=1)
        assert next(it) == 0
        it.close()  # must stop + join the worker
        n = len(reads)
        _time.sleep(0.2)
        assert len(reads) == n  # nothing read after close returned

    def test_sequential_reader_matches_read_video(self, tmp_path, rng):
        """SequentialVideoReader window-by-window == read_video all-at-once."""
        from vsrlab_tpu.data.video_io import (
            SequentialVideoReader,
            read_video,
            write_video,
        )

        src = tmp_path / "seq.mp4"
        write_video(src, rng.random((7, 16, 16, 3)).astype(np.float32), fps=12)
        whole, _, fps, h, w = read_video(src)

        r = SequentialVideoReader(src)
        assert (r.height, r.width) == (h, w) and abs(r.fps - fps) < 1e-6
        parts = []
        while True:
            chunk = r.read(3)
            if len(chunk) == 0:
                break
            parts.append(chunk)
        r.close()
        np.testing.assert_array_equal(np.concatenate(parts), whole)


class TestParamsBench:
    def test_speed_bench(self, run_dir):
        model, params, _ = load_test_model(run_dir)
        stats = speed_bench(model, params, clip_shape=(1, 2, 8, 8, 3), n_iters=2)
        assert stats["avg_time"] > 0
        assert stats["params"] == param_count(params)
