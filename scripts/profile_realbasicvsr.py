"""Phase-level timing of the RealBasicVSR bench workload on the chip.

Splits the 720p-output inference clip into its sequential phases —
cleaner, SpyNet flows, fused recurrence, fusion+upsample tail — timing
each as a separate jit with real arguments. Phases are sequential in the
model, so the parts should roughly sum to the whole; the gap is XLA
cross-phase fusion.

Run: python scripts/profile_realbasicvsr.py [block_unroll ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from vsrlab_tpu.models import RealBasicVSR  # noqa: E402
from vsrlab_tpu.utils import enable_compilation_cache  # noqa: E402

T, H, W = 10, 180, 320


def timed(fn, *args, iters=5):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
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
    unrolls = [int(a) for a in sys.argv[1:]] or [0]
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((1, T, H, W, 3)), jnp.float32)

    for bu in unrolls:
        model = RealBasicVSR(
            mid_channels=64, res_blocks=30, cleaning_blocks=20,
            dtype=jnp.bfloat16, block_unroll=bu,
        )
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), lr)

        @jax.jit
        def full(v, x):
            sr, _ = model.apply(v, x)
            return sr

        dt_full = timed(full, variables, lr)
        print(f"block_unroll={bu or 'full'}: full {dt_full*1e3:8.2f} ms "
              f"({T/dt_full:5.2f} fps)")

    # phase split with the default model via submodule applies
    model = RealBasicVSR(
        mid_channels=64, res_blocks=30, cleaning_blocks=20, dtype=jnp.bfloat16
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), lr)
    params = variables["params"]

    from vsrlab_tpu.models.basicvsr import BasicVSR
    from vsrlab_tpu.nn.blocks import IterativeRefinement

    cleaner = IterativeRefinement(64, 20, 3, dtype=jnp.bfloat16)

    @jax.jit
    def run_cleaner(p, x):
        b, t, h, w, c = x.shape
        return cleaner.apply(
            {"params": p["cleaner"]}, x.reshape(b * t, h, w, c)
        )

    dt_clean = timed(run_cleaner, params, lr)
    print(f"  cleaner (3 steps, 20 blk, bt={T}): {dt_clean*1e3:8.2f} ms")

    # the shipped cleaner path (frame_pack=True): pairs packed to C=128
    from vsrlab_tpu.nn.blocks import pack_frame_pair_params

    packed = IterativeRefinement(128, 20, 3, out_channels=6,
                                 dtype=jnp.bfloat16)

    @jax.jit
    def run_cleaner_packed(p, x):
        b, t, h, w, c = x.shape
        n = b * t
        f = x.reshape(n, h, w, c)
        xp = jnp.concatenate([f[: n // 2], f[n // 2:]], axis=-1)
        return packed.apply(
            {"params": pack_frame_pair_params(p["cleaner"])}, xp
        )

    dt_cp = timed(run_cleaner_packed, params, lr)
    print(f"  cleaner frame-packed (shipped):   {dt_cp*1e3:8.2f} ms")

    bvsr = BasicVSR(64, 30, 4, dtype=jnp.bfloat16)

    @jax.jit
    def run_flows(p, x):
        return bvsr.apply(
            {"params": p["basicvsr"]}, x, method=BasicVSR.compute_flow
        )

    lq = jnp.asarray(rng.random((1, T, H, W, 3)), jnp.float32)
    dt_flow = timed(run_flows, params, lq)
    print(f"  spynet flows (2x{T-1} pairs):     {dt_flow*1e3:8.2f} ms")

    @jax.jit
    def run_bvsr(p, x):
        return bvsr.apply({"params": p["basicvsr"]}, x)

    dt_bvsr = timed(run_bvsr, params, lq)
    print(f"  basicvsr total (flows+rec+up):    {dt_bvsr*1e3:8.2f} ms")
    print(f"  -> recurrence+tail ≈ {1e3*(dt_bvsr - dt_flow):8.2f} ms")
    print(f"  sum cleaner+basicvsr = {1e3*(dt_clean + dt_bvsr):8.2f} ms")


if __name__ == "__main__":
    main()
