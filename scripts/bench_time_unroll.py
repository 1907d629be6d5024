"""Probe: time-unroll the T=10 recurrence scan for HEADLINE INFERENCE.

Round 3 adopted ``BasicVSR.time_unroll`` auto-unrolling for T <= 8
because the lax.scan BACKWARD carries ~25% overhead (train step
177 -> 141 ms at b=4 t=6 64x64 — docs/tpu_kernel_notes.md round-3
train-step section). The headline inference bench runs T=10 through the
scan; whether unrolling wins FORWARD-only at the 180x320 bench shape
(where the scan body is ~30x larger than the train probe's) was never
measured. This probe answers it: same params, scan vs full unroll,
bench compiler options, tunnel-safe timing.

Run: python scripts/bench_time_unroll.py  (real TPU)
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from vsrlab_tpu.models import RealBasicVSR  # noqa: E402
from vsrlab_tpu.utils import best_time, enable_compilation_cache  # noqa: E402

BENCH_OPTS = {
    "xla_tpu_enable_experimental_fusion_cost_model": "true",
    "xla_tpu_scoped_vmem_limit_kib": "32768",
}


def main():
    enable_compilation_cache()
    t_frames, h, w = 10, 180, 320
    lr = jnp.asarray(
        np.random.default_rng(0).random((1, t_frames, h, w, 3)), jnp.float32
    )

    def build(unroll):
        return RealBasicVSR(
            mid_channels=64,
            res_blocks=30,
            cleaning_blocks=20,
            dtype=jnp.bfloat16,
            time_unroll=unroll,
        )

    base = build(0)
    params = jax.jit(base.init)(jax.random.PRNGKey(0), lr)["params"]

    ref = None
    for name, unroll in [("scan (shipped)", 0), ("full unroll", t_frames)]:
        model = build(unroll)

        @partial(jax.jit, compiler_options=BENCH_OPTS)
        def fwd(p, x, model=model):
            sr, _ = model.apply({"params": p}, x)
            # probe slice spans ALL T frames: later frames accumulate more
            # bf16 reassociation drift through the recurrence than frame 0
            # (ADVICE r3), so a frame-0-only probe understates the diff
            return jnp.sum(sr), sr[0, :, ::64, ::64, 0]

        s, probe = fwd(params, lr)
        float(s)
        if ref is None:
            ref = np.asarray(probe)
        else:
            # bf16 compute: loop restructuring reassociates fusions; a few
            # ULP at O(1) output magnitude (~8e-3 bf16 eps) is expected
            diff = float(np.max(np.abs(np.asarray(probe) - ref)))
            assert diff < 8e-3, diff
            print(f"  max |diff| vs scan on probe slice: {diff:.1e}")

        def sync(n, fwd=fwd):
            acc = None
            for _ in range(n):
                acc, _ = fwd(params, lr)
            float(acc)

        dt = best_time(sync, n_iters=5, repeats=3)
        print(f"{name:16s} {dt * 1e3:7.1f} ms  {t_frames / dt:6.2f} fps", flush=True)


if __name__ == "__main__":
    main()
