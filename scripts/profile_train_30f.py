"""Driver config #3 evidence: RealBasicVSR supervised train step on
30-frame clips (the RealBasicVSR training protocol; reference trains
`seq`-frame clips from conf — src/vsr/dataset.py:46 — and the driver's
config #3 is "RealBasicVSR, 30-frame clips, real-world degradations").

Measures the jitted train step at (b, 30, 64, 64) for the bench-size
model (mid 64, 30 res blocks, 20 cleaning blocks), with the recurrence
time-scan (T=30 > the time_unroll=8 auto cutoff) and optionally remat.

Run: python scripts/profile_train_30f.py [--batch 1] [--remat]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

from vsrlab_tpu.models import RealBasicVSR  # noqa: E402
from vsrlab_tpu.train import (  # noqa: E402
    create_train_state,
    make_supervised_train_step,
)
from vsrlab_tpu.utils import enable_compilation_cache  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    enable_compilation_cache()
    b, t, h, w, s = args.batch, args.frames, 64, 64, 4
    model = RealBasicVSR(
        mid_channels=64, res_blocks=30, cleaning_blocks=20,
        remat=args.remat, dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    batch = {
        "lr": jnp.asarray(rng.random((b, t, h, w, 3)), jnp.float32),
        "hr": jnp.asarray(rng.random((b, t, h * s, w * s, 3)), jnp.float32),
    }
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
    state = create_train_state(model, jax.random.PRNGKey(0), batch["lr"], tx)
    step = make_supervised_train_step(model, donate=False)

    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    print(
        f"compile+run {time.perf_counter() - t0:.0f}s "
        f"loss={float(metrics['Loss']):.4f}",
        flush=True,
    )

    from bench import _best_time  # shared axon-tunnel-safe timing loop

    def call_and_sync(n):
        nonlocal state
        m = metrics
        for _ in range(n):
            state, m = step(state, batch)
        float(m["Loss"])

    best = _best_time(call_and_sync, n_iters=3)
    print(
        f"train step (b={b}, t={t}): {best * 1e3:.1f} ms "
        f"({b * t / best:.1f} frames/s)"
    )


if __name__ == "__main__":
    main()
