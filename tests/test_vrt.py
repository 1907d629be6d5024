"""VRT tests: window helpers, attention vs torch oracle, stage, full model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsrlab_tpu.models.vrt import (
    RTMSA,
    TMSAG,
    Stage,
    TinyVRT,
    WindowAttention,
    compute_mask,
    get_window_size,
    window_partition,
    window_reverse,
)


class TestWindowHelpers:
    def test_partition_reverse_roundtrip(self, rng):
        x = jnp.asarray(rng.random((2, 4, 8, 8, 5)), jnp.float32)
        ws = (2, 4, 4)
        w = window_partition(x, ws)
        assert w.shape == (2 * 2 * 2 * 2, 32, 5)
        back = window_reverse(w, ws, 2, 4, 8, 8)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_get_window_size_shrinks(self):
        assert get_window_size((4, 8, 8), (6, 8, 8)) == (4, 8, 8)
        ws, ss = get_window_size((4, 16, 16), (6, 8, 8), (3, 4, 4))
        assert ws == (4, 8, 8) and ss == (0, 4, 4)

    def test_compute_mask_matches_torch_reference_algorithm(self):
        """Oracle: re-derive the mask with torch slicing semantics."""
        torch = pytest.importorskip("torch")
        ws, ss = (2, 4, 4), (1, 2, 2)
        dp, hp, wp = 4, 8, 8
        got = compute_mask(dp, hp, wp, ws, ss)

        img = torch.zeros((1, dp, hp, wp, 1))
        cnt = 0
        for d in (slice(-ws[0]), slice(-ws[0], -ss[0]), slice(-ss[0], None)):
            for h in (slice(-ws[1]), slice(-ws[1], -ss[1]), slice(-ss[1], None)):
                for w in (slice(-ws[2]), slice(-ws[2], -ss[2]), slice(-ss[2], None)):
                    img[:, d, h, w, :] = cnt
                    cnt += 1
        m = np.asarray(
            window_partition(jnp.asarray(img.numpy()), ws)
        ).squeeze(-1)
        want = m[:, None, :] - m[:, :, None]
        want = np.where(want != 0, -100.0, 0.0)
        np.testing.assert_array_equal(got, want)


class TestWindowAttention:
    @pytest.mark.parametrize("mut_attn", [False, True])
    def test_matches_torch_oracle(self, rng, mut_attn):
        """Re-run the attention math in torch with the flax weights."""
        torch = pytest.importorskip("torch")

        dim, heads, ws = 8, 2, (2, 4, 4)
        n = ws[0] * ws[1] * ws[2]
        mod = WindowAttention(dim, ws, heads, qkv_bias=True, mut_attn=mut_attn)
        x_np = rng.standard_normal((3, n, dim)).astype(np.float32)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
        got = np.asarray(mod.apply(variables, jnp.asarray(x_np)))

        p = jax.tree.map(np.asarray, variables["params"])
        from vsrlab_tpu.models.vrt.window_attention import (
            relative_position_index,
            sine_position_encoding,
        )

        xt = torch.from_numpy(x_np)

        def linear(name, v):
            w = torch.from_numpy(p[name]["kernel"])  # (in, out)
            out = v @ w
            if "bias" in p[name]:
                out = out + torch.from_numpy(p[name]["bias"])
            return out

        def attn(q, k, v, bias_table=None, rpi=None):
            scale = (dim // heads) ** -0.5
            a = (q * scale) @ k.transpose(-2, -1)
            if bias_table is not None:
                nq = q.shape[2]
                rel = bias_table[rpi[:nq, :nq].reshape(-1)].reshape(nq, nq, heads)
                a = a + rel.permute(2, 0, 1).unsqueeze(0)
            a = a.softmax(-1)
            out = a @ v
            return out.transpose(1, 2).reshape(out.shape[0], out.shape[2], dim)

        def to_heads(t):
            b_, nn_, _ = t.shape
            return t.reshape(b_, nn_, heads, dim // heads).permute(0, 2, 1, 3)

        qkv = linear("qkv_self", xt)
        q, k, v = (to_heads(t) for t in qkv.chunk(3, -1))
        table = torch.from_numpy(p["relative_position_bias_table"])
        rpi = torch.from_numpy(np.asarray(relative_position_index(ws)))
        x_out = attn(q, k, v, table, rpi)

        if mut_attn:
            pos = torch.from_numpy(
                np.asarray(sine_position_encoding((ws[1], ws[2]), dim // 2))
            ).repeat(1, 2, 1)
            qkv_m = linear("qkv_mut", xt + pos)
            qm, km, vm = (to_heads(t) for t in qkv_m.chunk(3, -1))
            half = n // 2
            x1 = attn(qm[:, :, half:], km[:, :, :half], vm[:, :, :half])
            x2 = attn(qm[:, :, :half], km[:, :, half:], vm[:, :, half:])
            x_out = torch.cat([torch.cat([x1, x2], 1), x_out], 2)

        want = linear("proj", x_out).numpy()
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_masked_attention_blocks_cross_region(self, rng):
        """With a -100 mask between two regions, softmax weight across the
        boundary must be ~0: output in region A is independent of B."""
        dim, heads, ws = 4, 1, (1, 2, 2)
        n = 4
        mod = WindowAttention(dim, ws, heads, mut_attn=False)
        x = jnp.asarray(rng.standard_normal((1, n, dim)), jnp.float32)
        variables = mod.init(jax.random.PRNGKey(0), x)
        mask = np.zeros((1, n, n), np.float32)
        mask[:, :2, 2:] = -100.0
        mask[:, 2:, :2] = -100.0
        out1 = mod.apply(variables, x, jnp.asarray(mask))
        x2 = x.at[:, 2:].add(10.0)  # perturb region B only
        out2 = mod.apply(variables, x2, jnp.asarray(mask))
        np.testing.assert_allclose(
            np.asarray(out1[:, :2]), np.asarray(out2[:, :2]), atol=1e-5
        )


class TestBlocks:
    def test_tmsag_shape_and_shift(self, rng):
        x = jnp.asarray(rng.random((1, 4, 8, 8, 8)), jnp.float32)
        mod = TMSAG(dim=8, depth=2, num_heads=2, window_size=(2, 4, 4))
        variables = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(variables, x)
        assert y.shape == x.shape

    def test_rtmsa_residual(self, rng):
        x = jnp.asarray(rng.random((1, 2, 8, 8, 8)), jnp.float32)
        mod = RTMSA(dim=8, depth=1, num_heads=2, window_size=(1, 4, 4))
        variables = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(variables, x)
        assert y.shape == x.shape

    @pytest.mark.slow  # default tier: TinyVRT forward exercises all stages
    def test_stage_down_up_shapes(self, rng):
        flows = [jnp.zeros((1, 3, 4, 4, 2), jnp.float32)]
        x = jnp.asarray(rng.random((1, 4, 8, 8, 8)), jnp.float32)
        down = Stage(
            in_dim=8, dim=8, depth=2, num_heads=2, window_size=(2, 4, 4),
            deformable_groups=2, reshape="down",
        )
        v = down.init(jax.random.PRNGKey(0), x, flows, flows)
        y = down.apply(v, x, flows, flows)
        assert y.shape == (1, 4, 4, 4, 8)

        flows_up = [jnp.zeros((1, 3, 16, 16, 2), jnp.float32)]
        x32 = jnp.asarray(rng.random((1, 4, 8, 8, 32)), jnp.float32)
        up = Stage(
            in_dim=32, dim=8, depth=2, num_heads=2, window_size=(2, 4, 4),
            deformable_groups=2, reshape="up",
        )
        v = up.init(jax.random.PRNGKey(0), x32, flows_up, flows_up)
        y = up.apply(v, x32, flows_up, flows_up)
        assert y.shape == (1, 4, 16, 16, 8)


class TestTinyVRT:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = TinyVRT(
            upscale=4,
            window_size=(2, 4, 4),
            depths=(2, 2, 2, 2, 2, 2, 2),
            embed_dims=(8, 8, 8, 8, 8, 8, 8),
            num_heads=(2, 2, 2, 2, 2, 2, 2),
            deformable_groups=2,
        )
        x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        return model, variables

    def test_forward_shapes(self, rng, model_and_vars):
        model, variables = model_and_vars
        x = jnp.asarray(rng.random((1, 4, 32, 32, 3)), jnp.float32)
        sr, lq = jax.jit(model.apply)(variables, x)
        assert sr.shape == (1, 4, 128, 128, 3)
        assert np.isfinite(np.asarray(sr)).all()
        np.testing.assert_array_equal(np.asarray(lq), np.asarray(x))

    @pytest.mark.slow
    def test_flow_net_frozen(self, rng, model_and_vars):
        model, variables = model_and_vars
        x = jnp.asarray(rng.random((1, 4, 32, 32, 3)), jnp.float32)

        def loss(params):
            sr, _ = model.apply({"params": params}, x)
            return jnp.mean(sr**2)

        grads = jax.jit(jax.grad(loss))(variables["params"])
        flow_norm = sum(
            float(jnp.abs(g).sum())
            for g in jax.tree.leaves(grads["optical_flow"])
        )
        assert flow_norm == 0.0

    @pytest.mark.parametrize(
        # both tiers are slow: the default tier keeps align_chunks
        # equality coverage through the faster harness-level
        # test_evaluation::test_sweep_align_chunks_matches; these pin
        # the stronger VRT-level bit-equality (padding + exact-divisor)
        "chunks", [pytest.param(3, marks=pytest.mark.slow),
                   pytest.param(4, marks=pytest.mark.slow)]
    )
    def test_align_chunks_match_batched(self, rng, model_and_vars, chunks):
        """align_chunks (scan-chunked parallel warping — the lever that
        fits single-pass full-scale VRT in HBM) must be a pure memory
        knob: same param tree, same outputs as the fully batched path.
        chunks=3 divides the 6-pair batch exactly; chunks=4 exercises
        the zero-padded non-divisor path."""
        model, variables = model_and_vars
        cmodel = model.clone(align_chunks=chunks)
        x = jnp.asarray(rng.random((1, 4, 32, 32, 3)), jnp.float32)
        cvars = jax.jit(cmodel.init)(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(cvars) == jax.tree_util.tree_structure(
            variables
        )
        sr, _ = jax.jit(model.apply)(variables, x)
        src, _ = jax.jit(cmodel.apply)(variables, x)
        np.testing.assert_allclose(
            np.asarray(sr), np.asarray(src), rtol=1e-6, atol=1e-6
        )

    @pytest.mark.slow
    def test_remat_matches_gradients(self, rng, model_and_vars):
        """remat=True (required to train full-config VRT within one chip's
        HBM — docs/tpu_kernel_notes.md) must not change numerics: same
        forward, gradients equal up to recompute reassociation noise."""
        model, variables = model_and_vars
        rmodel = model.clone(remat=True)
        x = jnp.asarray(rng.random((1, 4, 32, 32, 3)), jnp.float32)

        def loss(m):
            def f(params):
                sr, _ = m.apply({"params": params}, x)
                return jnp.mean(sr**2)

            return f

        g = jax.jit(jax.grad(loss(model)))(variables["params"])
        gr = jax.jit(jax.grad(loss(rmodel)))(variables["params"])
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(gr)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )


class TestShrunkWindowReuse:
    def test_rtmsa_params_serve_shorter_clips(self, rng):
        """The relative-position bias table is sized by the DECLARED
        window (reference window_attention.py:121-124), so params
        initialised at T >= window apply to shorter clips whose runtime
        window shrinks (was: ScopeParamShapeError)."""
        from vsrlab_tpu.models.vrt.tmsa import RTMSA

        m = RTMSA(dim=16, depth=1, num_heads=2, window_size=(6, 8, 8),
                  drop_path=[0.0])
        x6 = jnp.asarray(rng.random((1, 6, 16, 16, 16)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x6)
        for t in (2, 3, 5):
            y = m.apply(v, x6[:, :t])
            assert y.shape == (1, t, 16, 16, 16)
            assert np.isfinite(np.asarray(y)).all()


class TestDropPath:
    """Stochastic depth (reference stochastic_depth.py:4-23) — closes the
    last untested row of docs/parity_map.md §2.5."""

    def test_deterministic_identity(self, rng):
        from vsrlab_tpu.models.vrt.tmsa import DropPath

        x = jnp.asarray(rng.random((4, 3, 5)), jnp.float32)
        dp = DropPath(rate=0.5)
        y = dp.apply({}, x, deterministic=True)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
        # rate 0 is identity even in train mode
        y0 = DropPath(rate=0.0).apply(
            {}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(0)}
        )
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(x))

    def test_train_mode_drops_whole_samples_scaled(self, rng):
        from vsrlab_tpu.models.vrt.tmsa import DropPath

        x = jnp.ones((64, 2, 3), jnp.float32)
        dp = DropPath(rate=0.5)
        y = np.asarray(
            dp.apply(
                {}, x, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
        )
        # each SAMPLE is either fully zero or fully scaled by 1/keep
        per_sample = y.reshape(64, -1)
        zero = np.all(per_sample == 0.0, axis=1)
        kept = np.all(per_sample == 2.0, axis=1)
        assert np.all(zero | kept)
        assert zero.any() and kept.any()  # both outcomes at rate .5, n=64
        # survivor scaling keeps the expectation unbiased
        assert abs(y.mean() - 1.0) < 0.4


class TestFactoredMask:
    """The per-axis factored mask (round 3 — full-scale VRT's dense mask
    constant is 1.8 GB) must blank exactly the pairs the dense mask
    blanks, and attention through it must match the dense-mask path."""

    def test_factored_labels_expand_to_dense(self):
        from vsrlab_tpu.models.vrt.window_attention import (
            compute_mask_factored,
        )

        ws, ss = (2, 4, 4), (1, 2, 2)
        dp, hp, wp = 4, 8, 8
        dense = compute_mask(dp, hp, wp, ws, ss)
        ld, lh, lw = compute_mask_factored(dp, hp, wp, ws, ss).labels
        # combined label triple per (window, pos); differ on any axis
        lab = (
            ld[:, None, None, :, None, None] * 9
            + lh[None, :, None, None, :, None] * 3
            + lw[None, None, :, None, None, :]
        ).reshape(-1, ws[0] * ws[1] * ws[2])
        expect = np.where(lab[:, None, :] != lab[:, :, None], -100.0, 0.0)
        np.testing.assert_array_equal(expect != 0, np.asarray(dense) != 0)

    def test_attention_matches_dense_mask(self, rng):
        from vsrlab_tpu.models.vrt.window_attention import (
            WindowAttention,
            compute_mask_factored,
        )

        ws = (2, 4, 4)
        ss = (1, 2, 2)
        dp, hp, wp = 4, 8, 8
        nw = (dp // ws[0]) * (hp // ws[1]) * (wp // ws[2])
        n = ws[0] * ws[1] * ws[2]
        c = 12
        x = jnp.asarray(rng.standard_normal((2 * nw, n, c)), jnp.float32)
        attn = WindowAttention(c, ws, num_heads=2, mut_attn=True)
        v = attn.init(jax.random.PRNGKey(0), x)
        dense = jnp.asarray(compute_mask(dp, hp, wp, ws, ss))
        fact = compute_mask_factored(dp, hp, wp, ws, ss)
        out_d = attn.apply(v, x, dense)
        out_f = attn.apply(v, x, fact)
        np.testing.assert_allclose(
            np.asarray(out_d), np.asarray(out_f), rtol=1e-5, atol=1e-6
        )
