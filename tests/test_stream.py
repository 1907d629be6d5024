"""Streaming (stateful windowed) inference tests.

``BasicVSR.__call__(stream_state=..., return_state=True)`` carries the
forward-direction recurrence across windows. Exactness claims tested:

* the forward hidden state streamed across windows equals a full-clip
  run, so the LAST frame of the final window (whose backward state is a
  fresh zero carry in BOTH runs) matches the full-clip output;
* without a state the streaming API degenerates to the plain call.

The reference resets both directions every window (src/test.py:124-135);
streaming is a capability beyond it.
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from vsrlab_tpu.models import BasicVSR, RealBasicVSR


def tiny_basicvsr(**kw):
    return BasicVSR(mid_channels=8, res_blocks=1, upscale=4, **kw)


class TestBasicVSRStreaming:
    def test_plain_call_unchanged(self, rng):
        """return_state=False (default) keeps the original contract."""
        model = tiny_basicvsr()
        lrs = jnp.asarray(rng.random((1, 4, 16, 16, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), lrs)
        sr = model.apply(variables, lrs)
        assert sr.shape == (1, 4, 64, 64, 3)

    def test_state_contents(self, rng):
        """Returned state = (last input frame, forward carry)."""
        model = tiny_basicvsr()
        lrs = jnp.asarray(rng.random((1, 3, 16, 16, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), lrs)
        sr, (last, carry) = model.apply(variables, lrs, return_state=True)
        np.testing.assert_array_equal(np.asarray(last), np.asarray(lrs[:, -1]))
        assert carry.shape == (1, 16, 16, 8)
        # the plain call is unchanged by asking for the state
        sr_plain = model.apply(variables, lrs)
        np.testing.assert_array_equal(np.asarray(sr), np.asarray(sr_plain))

    @pytest.mark.slow  # default tier: test_three_window_chain covers chaining
    def test_streamed_final_frame_matches_full_clip(self, rng):
        """Both runs start the final frame's backward step from a zero
        carry, and streaming makes the forward carry exact — so the last
        output frame must match the full-clip run."""
        model = tiny_basicvsr()
        lrs = jnp.asarray(rng.random((2, 6, 16, 16, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), lrs)
        full = model.apply(variables, lrs)

        _, state = model.apply(variables, lrs[:, :3], return_state=True)
        sr2 = model.apply(variables, lrs[:, 3:], stream_state=state)
        np.testing.assert_allclose(
            np.asarray(sr2[:, -1]), np.asarray(full[:, -1]),
            rtol=2e-5, atol=2e-6,
        )

    @pytest.mark.slow  # default tier: TestRealBasicVSRStreaming covers
    # streaming at the full-model level
    def test_three_window_chain(self, rng):
        """State threads through >2 windows (uneven sizes)."""
        model = tiny_basicvsr()
        lrs = jnp.asarray(rng.random((1, 7, 16, 16, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), lrs)
        full = model.apply(variables, lrs)

        _, state = model.apply(variables, lrs[:, :2], return_state=True)
        _, state = model.apply(
            variables, lrs[:, 2:5], stream_state=state, return_state=True
        )
        sr3 = model.apply(variables, lrs[:, 5:], stream_state=state)
        np.testing.assert_allclose(
            np.asarray(sr3[:, -1]), np.asarray(full[:, -1]),
            rtol=2e-5, atol=2e-6,
        )

    @pytest.mark.slow  # quality comparison, not a correctness gate
    def test_streaming_beats_stateless_windows(self, rng):
        """On the second window's first frames, the streamed output must
        be closer to the full-clip result than the stateless window is
        (the quality argument for --stream)."""
        model = tiny_basicvsr()
        lrs = jnp.asarray(rng.random((1, 6, 16, 16, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), lrs)
        full = np.asarray(model.apply(variables, lrs))

        _, state = model.apply(variables, lrs[:, :3], return_state=True)
        streamed = np.asarray(
            model.apply(variables, lrs[:, 3:], stream_state=state)
        )
        stateless = np.asarray(model.apply(variables, lrs[:, 3:]))
        err_streamed = np.abs(streamed - full[:, 3:]).mean()
        err_stateless = np.abs(stateless - full[:, 3:]).mean()
        assert err_streamed < err_stateless

    @pytest.mark.slow  # fallback path; the shipped fused path is
    # default-covered by TestRealBasicVSRStreaming
    def test_unfused_path_matches_fused(self, rng):
        """Streaming works identically through fuse_directions=False."""
        lrs = jnp.asarray(rng.random((1, 5, 16, 16, 3)), jnp.float32)
        fused = tiny_basicvsr(fuse_directions=True)
        unfused = tiny_basicvsr(fuse_directions=False)
        variables = fused.init(jax.random.PRNGKey(0), lrs)

        _, st_f = fused.apply(variables, lrs[:, :2], return_state=True)
        _, st_u = unfused.apply(variables, lrs[:, :2], return_state=True)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
            ),
            st_f, st_u,
        )
        out_f = fused.apply(variables, lrs[:, 2:], stream_state=st_f)
        out_u = unfused.apply(variables, lrs[:, 2:], stream_state=st_u)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_u), rtol=2e-5, atol=2e-6
        )


class TestRealBasicVSRStreaming:
    def test_state_is_cleaned_frame(self, rng):
        """RealBasicVSR's stream state frame is the CLEANED last frame
        (flows are computed on cleaned input)."""
        model = RealBasicVSR(
            mid_channels=8, res_blocks=1, cleaning_blocks=1, cleaning_steps=1
        )
        lr = jnp.asarray(rng.random((1, 3, 16, 16, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), lr)
        sr, lq, (last, carry) = model.apply(variables, lr, return_state=True)
        np.testing.assert_allclose(
            np.asarray(last), np.asarray(lq[:, -1]), rtol=1e-6, atol=1e-7
        )

    def test_streamed_final_frame_matches_full_clip(self, rng):
        model = RealBasicVSR(
            mid_channels=8, res_blocks=1, cleaning_blocks=1, cleaning_steps=1
        )
        lr = jnp.asarray(rng.random((1, 6, 16, 16, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), lr)
        full, _ = model.apply(variables, lr)

        _, _, state = model.apply(variables, lr[:, :3], return_state=True)
        sr2, _ = model.apply(variables, lr[:, 3:], stream_state=state)
        np.testing.assert_allclose(
            np.asarray(sr2[:, -1]), np.asarray(full[:, -1]),
            rtol=2e-5, atol=2e-6,
        )

    @pytest.mark.slow  # default tier: test_acceptance.py's streamed-mode
    # test drives make_stream_forward end-to-end through the acceptance CLI
    def test_make_stream_forward(self, rng):
        """The harness factory chains windows end-to-end."""
        from vsrlab_tpu.evaluation.harness import make_stream_forward

        model = RealBasicVSR(
            mid_channels=8, res_blocks=1, cleaning_blocks=1, cleaning_steps=1
        )
        lr = jnp.asarray(rng.random((1, 4, 16, 16, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), lr)
        full, _ = model.apply(variables, lr)

        first, rest = make_stream_forward(model)
        sr1, state = first(variables["params"], lr[:, :2])
        sr2, state = rest(variables["params"], lr[:, 2:], state)
        assert sr1.shape == (1, 2, 64, 64, 3)
        np.testing.assert_allclose(
            np.asarray(sr2[:, -1]), np.asarray(full[:, -1]),
            rtol=2e-5, atol=2e-6,
        )
