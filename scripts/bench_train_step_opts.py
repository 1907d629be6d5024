"""Probe: supervised train-step levers at the bench shape (VERDICT r3 #4).

Round 3 adopted time-unroll (255.6 -> 214.7 ms at b=4 t=6 64x64). The
remaining named levers, measured here at the exact bench train shape:

  opts      the inference leg's measured compiler options (experimental
            fusion cost model + 32 MiB scoped VMEM) — never applied to
            the TRAIN step before
  donate    donate_argnums on the state (what the real trainers run;
            bench.py uses donate=False only so the timing loop can
            reuse buffers)
  remat     per-cell nn.remat (trades recompute for backward locality)
  unroll2   time_unroll=2 (between scan and full unroll)

Run: python scripts/bench_train_step_opts.py  (real TPU)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

from vsrlab_tpu.models import RealBasicVSR  # noqa: E402
from vsrlab_tpu.train import create_train_state, make_supervised_train_step  # noqa: E402
from vsrlab_tpu.utils import best_time, enable_compilation_cache  # noqa: E402

BENCH_OPTS = {
    "xla_tpu_enable_experimental_fusion_cost_model": "true",
    "xla_tpu_scoped_vmem_limit_kib": "32768",
}


def measure(model, batch, donate=False, compiler_options=None):
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
    state = create_train_state(model, jax.random.PRNGKey(0), batch["lr"], tx)
    step = make_supervised_train_step(model, donate=donate)
    if compiler_options:
        # rebuild the jit with options (make_… returns a jit-wrapped fn)
        step = jax.jit(
            step.__wrapped__,
            donate_argnums=(0,) if donate else (),
            compiler_options=compiler_options,
        )
    compiled = step.lower(state, batch).compile()
    state, metrics = compiled(state, batch)
    float(metrics["Loss"])

    if donate:
        # donated buffers: rebuild state each call is wrong; instead chain
        # states (the returned state feeds the next call, as in training)
        def sync(n):
            nonlocal state
            m = metrics
            for _ in range(n):
                state, m = compiled(state, batch)
            float(m["Loss"])
    else:
        def sync(n):
            s, m = state, metrics
            for _ in range(n):
                s, m = compiled(state, batch)
            float(m["Loss"])

    return best_time(sync, n_iters=5, repeats=3)


def main():
    enable_compilation_cache()
    b, t, h, w, scale = 4, 6, 64, 64, 4
    rng = np.random.default_rng(1)
    batch = {
        "lr": jnp.asarray(rng.random((b, t, h, w, 3)), jnp.float32),
        "hr": jnp.asarray(rng.random((b, t, h * scale, w * scale, 3)), jnp.float32),
    }

    def build(**kw):
        return RealBasicVSR(
            mid_channels=64, res_blocks=30, cleaning_blocks=20,
            dtype=jnp.bfloat16, **kw,
        )

    cases = [
        ("shipped (unroll, no-donate)", build(), {}),
        ("+ bench compiler opts", build(), {"compiler_options": BENCH_OPTS}),
        ("+ donate", build(), {"donate": True}),
        ("+ opts + donate", build(), {"donate": True, "compiler_options": BENCH_OPTS}),
        ("remat cells", build(remat=True), {}),
        ("time_unroll=2", build(time_unroll=2), {}),
    ]
    for name, model, kw in cases:
        try:
            dt = measure(model, batch, **kw)
            print(f"{name:28s} {dt*1e3:7.1f} ms  {b*t/dt:6.1f} frames/s", flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
