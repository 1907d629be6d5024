"""Microbench the RealBasicVSR cleaner's boundary convs in s2d form.

The cleaner phase is the largest inference phase at the bench shape
(156 ms of the ~313 ms 10-frame budget, 33.6 TF/s vs the measured
~49 TF/s C=64 lane ceiling — docs/tpu_kernel_notes.md). Its 64-channel
residual stack is already near the lane ceiling; the remaining padding
is in the per-step boundary convs: the 3→64 head (K=27 of a 128 tile,
N=64) and the 64→3 tail (N=3 of a 128 tile). Both have exact
space-to-depth lowerings (ops/s2d_conv): a 3×3 conv on (H/2, W/2, 12)
producing 4 phases × features — 4× the nominal FLOPs (k=3 ⇒ ks=3) but
up to 8× better MXU tile utilisation.

Variants (same parameters, re-expressed):
  plain      IterativeRefinement as shipped
  s2d_head   head conv in s2d space (d2s back before the stack)
  s2d_both   head and tail convs in s2d space

Run: python scripts/bench_cleaner_s2d.py
"""

from __future__ import annotations

import sys
import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from vsrlab_tpu.nn.blocks import IterativeRefinement, ResidualConv  # noqa: E402
from vsrlab_tpu.ops.s2d_conv import (  # noqa: E402
    conv_s2d,
    depth_to_space,
    s2d_bias,
    s2d_kernel,
    space_to_depth,
)
from vsrlab_tpu.utils import enable_compilation_cache  # noqa: E402


class _Stack(nn.Module):
    """The cleaner's 20-block residual stack, standalone (same param
    layout as inside IterativeRefinement.ResidualBlock_0)."""

    mid: int
    blocks: int

    @nn.compact
    def __call__(self, x):
        scan = nn.scan(
            lambda mod, carry, _: (mod(carry), None),
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.blocks,
            unroll=4,
        )
        x, _ = scan(
            ResidualConv(self.mid, dtype=jnp.bfloat16, name="res_blocks"), x, None
        )
        return x


def timed(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    shape = (2, 16, 24, 3) if "--small" in sys.argv else (10, 180, 320, 3)
    x = jnp.asarray(rng.random(shape), jnp.float32)

    model = IterativeRefinement(dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    params = variables["params"]

    plain = jax.jit(lambda v, y: model.apply({"params": v}, y))

    def apply_s2d(v, y, s2d_head, s2d_tail):
        dt = jnp.bfloat16
        mid = model.mid_channels
        hk = v["ResidualBlock_0"]["ConvLeaky_0"]["Conv2d_0"]["Conv_0"]["kernel"]
        hb = v["ResidualBlock_0"]["ConvLeaky_0"]["Conv2d_0"]["Conv_0"]["bias"]
        tk = v["Conv2d_0"]["Conv_0"]["kernel"]
        tb = v["Conv2d_0"]["Conv_0"]["bias"]
        res = {"params": {"res_blocks": v["ResidualBlock_0"]["res_blocks"]}}
        stack = _Stack(mid, model.blocks)

        def conv_plain(t, k, b):
            tc = t.astype(dt)
            kc = k.astype(dt)
            dn = jax.lax.conv_dimension_numbers(
                tc.shape, kc.shape, ("NHWC", "HWIO", "NHWC")
            )
            return (
                jax.lax.conv_general_dilated(
                    tc, kc, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn
                )
                + b.astype(dt)
            )

        hk_s, hb_s = s2d_kernel(hk).astype(dt), s2d_bias(hb).astype(dt)
        tk_s, tb_s = s2d_kernel(tk).astype(dt), s2d_bias(tb).astype(dt)
        for _ in range(model.steps):
            if s2d_head:
                xs = space_to_depth(y).astype(dt)
                h = depth_to_space(conv_s2d(xs, hk_s) + hb_s)
            else:
                h = conv_plain(y, hk, hb)
            h = nn.leaky_relu(h, 0.1)
            h = stack.apply(res, h)
            if s2d_tail:
                r = depth_to_space(conv_s2d(space_to_depth(h), tk_s) + tb_s)
            else:
                r = conv_plain(h, tk, tb)
            y = y + r.astype(y.dtype)
        return y

    s2d_head = jax.jit(lambda v, y: apply_s2d(v, y, True, False))
    s2d_both = jax.jit(lambda v, y: apply_s2d(v, y, True, True))

    ref = np.asarray(plain(params, x), np.float32)
    mag = np.max(np.abs(ref)) + 1e-8
    for name, fn in [("plain", plain), ("s2d_head", s2d_head), ("s2d_both", s2d_both)]:
        r = np.asarray(fn(params, x), np.float32)
        err = np.max(np.abs(ref - r)) / mag
        dt_s = timed(fn, params, x)
        print(f"{name:10s} {dt_s*1e3:8.1f} ms   rel max diff {err:.1e}", flush=True)


if __name__ == "__main__":
    main()
