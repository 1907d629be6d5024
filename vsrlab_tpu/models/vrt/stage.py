"""VRT Stage: TMSA groups + parallel flow-guided warping (Flax).

Capability parity with the reference Stage
(src/vsr/models/VRT/modules/stage.py:9-129), TPU-first:

* reshape = pure space-to-channel (down) / channel-to-space (up) reshapes
  + LayerNorm + Linear (reference uses einops Rearrange);
* the parallel-warping per-frame Python loop (reference :109-129) is
  BATCHED: all T-1 frame alignments run as one flow_warp and one
  flow-guided deformable conv over a ``B·(T-1)`` batch — the MXU sees
  one big matmul instead of T-1 small ones;
* everything stays (B, D, H, W, C); no `n c d h w` transposes.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vsrlab_tpu.models.vrt.deform import FlowGuidedDeformAlign
from vsrlab_tpu.models.vrt.tmsa import TMSAG
from vsrlab_tpu.models.vrt.window_attention import MlpGEGLU, _dense
from vsrlab_tpu.ops.warp import flow_warp

Dtype = Any


class Stage(nn.Module):
    in_dim: int
    dim: int
    depth: int
    num_heads: int
    window_size: Sequence[int]
    mul_attn_ratio: float = 0.75
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path: Any = 0.0
    pa_frames: int = 2
    deformable_groups: int = 16
    reshape: str = "none"
    max_residue_magnitude: float = 10.0
    head_shard_axis: Optional[str] = None
    # Run the parallel-warping alignment in ``align_chunks`` sequential
    # chunks over the 2·B·(T-1) frame-pair batch (lax.scan with broadcast
    # params). 0 = fully batched. Numerics are identical (every op is
    # per-sample); peak memory for the offset fields / packed-gather
    # windows scales down by the chunk count — the lever that lets
    # full-scale VRT (16×256×256) run single-pass instead of tiled
    # (docs/tpu_kernel_notes.md round-3 memory campaign).
    align_chunks: int = 0
    dtype: Dtype = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        flows_backward: List[jnp.ndarray],
        flows_forward: List[jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, d, h, w, c = x.shape

        # --- reshape + norm (+ linear for scale changes) ---
        if self.reshape == "none":
            x = nn.LayerNorm(dtype=self.dtype, name="reshape_norm")(x)
        elif self.reshape == "down":
            # space-to-channel 2x2: (B,D,H,W,C) -> (B,D,H/2,W/2,4C)
            x = x.reshape(b, d, h // 2, 2, w // 2, 2, c)
            # channel order (neiw neih c): w-offset outer, h-offset inner
            x = x.transpose(0, 1, 2, 4, 5, 3, 6).reshape(b, d, h // 2, w // 2, 4 * c)
            x = nn.LayerNorm(dtype=self.dtype, name="reshape_norm")(x)
            x = _dense(self.dim, 4 * self.in_dim, True, self.dtype, "reshape_linear")(x)
        elif self.reshape == "up":
            # channel-to-space 2x2: (B,D,H,W,C) -> (B,D,2H,2W,C/4)
            x = x.reshape(b, d, h, w, 2, 2, c // 4)
            x = x.transpose(0, 1, 2, 5, 3, 4, 6).reshape(b, d, 2 * h, 2 * w, c // 4)
            x = nn.LayerNorm(dtype=self.dtype, name="reshape_norm")(x)
            x = _dense(self.dim, self.in_dim // 4, True, self.dtype, "reshape_linear")(x)
        else:
            raise ValueError(f"unknown reshape: {self.reshape}")

        # --- attention groups ---
        depth1 = int(self.depth * self.mul_attn_ratio)
        dp_list = (
            list(self.drop_path)
            if isinstance(self.drop_path, (list, tuple))
            else [self.drop_path] * self.depth
        )
        y = TMSAG(
            dim=self.dim,
            depth=depth1,
            num_heads=self.num_heads,
            window_size=(2, self.window_size[1], self.window_size[2]),
            mut_attn=True,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            drop_path=dp_list[:depth1],
            head_shard_axis=self.head_shard_axis,
            dtype=self.dtype,
            name="residual_group1",
        )(x, deterministic)
        x = _dense(self.dim, self.dim, True, self.dtype, "linear1")(y) + x

        y = TMSAG(
            dim=self.dim,
            depth=self.depth - depth1,
            num_heads=self.num_heads,
            window_size=tuple(self.window_size),
            mut_attn=False,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            drop_path=dp_list[depth1:],
            head_shard_axis=self.head_shard_axis,
            dtype=self.dtype,
            name="residual_group2",
        )(x, deterministic)
        x = _dense(self.dim, self.dim, True, self.dtype, "linear2")(y) + x

        # --- parallel warping (batched over frames) ---
        x_backward, x_forward = self._aligned_features(
            x, flows_backward[0], flows_forward[0]
        )
        fused = MlpGEGLU(3 * self.dim, self.dim, dtype=self.dtype, name="pa_fuse")(
            jnp.concatenate([x, x_backward, x_forward], axis=-1)
        )
        return fused

    def _aligned_features(self, x, flow_backward, flow_forward):
        """Align neighbour frames with flow + deformable conv
        (reference get_aligned_features, stage.py:109-129) — one batched
        call per direction instead of a per-frame loop; optionally
        chunked over frame pairs (``align_chunks``) to bound peak
        memory at large spatial scales."""
        b, t, h, w, c = x.shape
        align = FlowGuidedDeformAlign(
            self.dim,
            self.deformable_groups,
            self.max_residue_magnitude,
            self.pa_frames,
            dtype=self.dtype,
            name="pa_deform",
        )

        def flat(clip):  # (B, T-1, H, W, C) -> (B*(T-1), H, W, C)
            return clip.reshape((-1,) + clip.shape[2:])

        def warp_align(mdl, frames, flows, currents):
            warped = flow_warp(frames, flows)
            return mdl(frames, [warped], currents, [flows])

        if self.align_chunks > 1:
            # both directions share pa_deform's params, so they fuse into
            # ONE (2·B·(T-1)) batch scanned in chunks; per-sample ops make
            # the result identical to the batched path (equality-tested)
            frames = jnp.concatenate([flat(x[:, 1:]), flat(x[:, :-1])], 0)
            flows = jnp.concatenate([flat(flow_backward), flat(flow_forward)], 0)
            currents = jnp.concatenate([flat(x[:, :-1]), flat(x[:, 1:])], 0)
            n = frames.shape[0]
            # honour the requested chunk count for ANY frame-pair count by
            # zero-padding to a chunk multiple (a divisor-only fallback
            # could silently collapse to near-batched memory — e.g. n=62
            # only divides by 2); padded samples are discarded below and
            # cost at most one extra scan step of work
            chunks = min(self.align_chunks, n)
            size = -(-n // chunks)
            pad = chunks * size - n

            def body(mdl, carry, xs):
                return carry, warp_align(mdl, *xs)

            scan = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0,
                out_axes=0,
            )

            def chunked(v):
                if pad:
                    v = jnp.concatenate(
                        [v, jnp.zeros((pad,) + v.shape[1:], v.dtype)], 0
                    )
                return v.reshape((chunks, size) + v.shape[1:])

            _, aligned = scan(
                align, None, (chunked(frames), chunked(flows), chunked(currents))
            )
            aligned = aligned.reshape((chunks * size,) + aligned.shape[2:])
            aligned = aligned[: n].reshape(2, b, t - 1, h, w, c)
            aligned_b, aligned_f = aligned[0], aligned[1]
        else:
            # backward: frame i+1 aligned towards i, for i = 0..t-2
            aligned_b = warp_align(
                align, flat(x[:, 1:]), flat(flow_backward), flat(x[:, :-1])
            ).reshape(b, t - 1, h, w, c)
            # forward: frame i-1 aligned towards i, for i = 1..t-1
            aligned_f = warp_align(
                align, flat(x[:, :-1]), flat(flow_forward), flat(x[:, 1:])
            ).reshape(b, t - 1, h, w, c)

        x_backward = jnp.concatenate(
            [aligned_b, jnp.zeros_like(x[:, -1:])], axis=1
        )
        x_forward = jnp.concatenate(
            [jnp.zeros_like(x[:, :1]), aligned_f], axis=1
        )
        return x_backward, x_forward
