"""Per-component VRT timing on the real chip (VERDICT r1 #3, profile half).

Times the full TinyVRT forward and its constituent hot modules at the
same shapes, with real jit arguments (closure-captured inputs get
constant-folded — docs/tpu_kernel_notes.md). Attribution is by component
microbenches, which double-counts nothing at this granularity: SpyNet,
the 7 stages, and the trunk are sequential in the model.

Run: python scripts/profile_vrt.py [frames] [height] [width]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from vsrlab_tpu.models import TinyVRT  # noqa: E402
from vsrlab_tpu.models.spynet import SpyNet  # noqa: E402
from vsrlab_tpu.models.vrt.stage import Stage  # noqa: E402
from vsrlab_tpu.models.vrt.tmsa import RTMSA  # noqa: E402
from vsrlab_tpu.utils import enable_compilation_cache  # noqa: E402

DT = jnp.bfloat16


def timed(fn, *args, iters=5):
    out = fn(*args)
    s = jax.tree.leaves(out)[0]
    float(jnp.sum(s))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    enable_compilation_cache()
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, t, h, w, 3)), jnp.float32)

    # SpyNet: both directions batched = 2*(t-1) pairs, 3 levels
    spynet = SpyNet(return_levels=(3, 4, 5), dtype=DT)
    pairs = jnp.asarray(rng.random((2 * (t - 1), h, w, 3)), jnp.float32)
    sv = jax.jit(spynet.init)(jax.random.PRNGKey(1), pairs, pairs)

    @jax.jit
    def flows(v, a, b):
        return spynet.apply(v, a, b)

    dt_spy = timed(flows, sv, pairs, pairs)
    print(f"  SpyNet 3-level {2*(t-1)} pairs:      {dt_spy*1e3:8.2f} ms")

    # one scale-1 stage (TinyVRT dims 32, depth 4, window (6,8,8))
    dims, depth, heads, ws, dg = 32, 4, 4, (6, 8, 8), 4
    feat = jnp.asarray(rng.random((1, t, h, w, dims)), DT)
    flow1 = jnp.asarray(rng.random((1, t - 1, h, w, 2)), jnp.float32)
    stage = Stage(
        in_dim=dims, dim=dims, depth=depth, num_heads=heads, window_size=ws,
        deformable_groups=dg, reshape="none", dtype=DT,
    )
    stv = jax.jit(stage.init)(jax.random.PRNGKey(2), feat, [flow1], [flow1])

    @jax.jit
    def stage_fwd(v, f, fl):
        return stage.apply(v, f, [fl], [fl])

    dt_stage = timed(stage_fwd, stv, feat, flow1)
    print(f"  Stage scale-1 (depth {depth}):        {dt_stage*1e3:8.2f} ms")

    # trunk RTMSA (2 blocks of depth 4 at dims 32 in TinyVRT)
    rt = RTMSA(dim=dims, depth=depth, num_heads=heads, window_size=ws, dtype=DT)
    rv = jax.jit(rt.init)(jax.random.PRNGKey(3), feat)

    @jax.jit
    def rt_fwd(v, f):
        return rt.apply(v, f)

    dt_rt = timed(rt_fwd, rv, feat)
    print(f"  RTMSA trunk block (depth {depth}):    {dt_rt*1e3:8.2f} ms")

    # stage component split: attention groups vs parallel warping
    from vsrlab_tpu.models.vrt.tmsa import TMSAG

    tg = TMSAG(
        dim=dims, depth=3, num_heads=heads, window_size=(2, ws[1], ws[2]),
        mut_attn=True, dtype=DT,
    )
    tv = jax.jit(tg.init)(jax.random.PRNGKey(4), feat)

    @jax.jit
    def tg_fwd(v, f):
        return tg.apply(v, f)

    dt_tmsag = timed(tg_fwd, tv, feat)
    print(f"  TMSAG mutual depth-3:           {dt_tmsag*1e3:8.2f} ms")

    model = TinyVRT(dtype=DT)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    @jax.jit
    def full(v, x):
        sr, _ = model.apply(v, x)
        return sr

    dt_full = timed(full, variables, x)
    print(f"TinyVRT full forward ({t}f {h}x{w}): {dt_full*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
