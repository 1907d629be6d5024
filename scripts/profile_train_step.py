"""Decompose the supervised train step at the bench shape (VERDICT r2 #2).

Times, as separate jits with real arguments on the chip:
  * forward loss only
  * forward + backward (value_and_grad)
  * full step (fwd + bwd + clip + adam) with and without on-device metrics
  * cleaner-only and recurrence-only value_and_grad
so the fwd:bwd:opt:metrics split and the top sinks are explicit.

Run: python scripts/profile_train_step.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

from vsrlab_tpu.models import RealBasicVSR  # noqa: E402
from vsrlab_tpu.models.basicvsr import BasicVSR  # noqa: E402
from vsrlab_tpu.nn.blocks import IterativeRefinement  # noqa: E402
from vsrlab_tpu.train import (  # noqa: E402
    create_train_state,
    make_supervised_train_step,
)
from vsrlab_tpu.train.step import supervised_loss  # noqa: E402
from vsrlab_tpu.utils import enable_compilation_cache  # noqa: E402

B, T, H, W, S = 4, 6, 64, 64, 4


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
    rng = np.random.default_rng(1)
    lr = jnp.asarray(rng.random((B, T, H, W, 3)), jnp.float32)
    hr = jnp.asarray(rng.random((B, T, H * S, W * S, 3)), jnp.float32)
    batch = {"lr": lr, "hr": hr}

    model = RealBasicVSR(
        mid_channels=64, res_blocks=30, cleaning_blocks=20, dtype=jnp.bfloat16
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
    state = create_train_state(model, jax.random.PRNGKey(0), lr, tx)
    params = state.params

    @jax.jit
    def fwd_loss(p, lr, hr):
        out = model.apply({"params": p}, lr)
        loss, _ = supervised_loss(out, {"lr": lr, "hr": hr})
        return loss

    @jax.jit
    def fwd_bwd(p, lr, hr):
        return jax.value_and_grad(
            lambda p: fwd_loss.__wrapped__(p, lr, hr)
        )(p)

    step_m = make_supervised_train_step(model, donate=False)
    step_nm = make_supervised_train_step(
        model, compute_metrics=False, donate=False
    )

    t_fwd = timed(fwd_loss, params, lr, hr)
    t_fb = timed(fwd_bwd, params, lr, hr)
    t_full = timed(lambda s, b: step_m(s, b)[1], state, batch)
    t_nom = timed(lambda s, b: step_nm(s, b)[1], state, batch)
    print(f"forward loss                : {t_fwd*1e3:8.2f} ms")
    print(f"forward+backward            : {t_fb*1e3:8.2f} ms  (bwd ≈ {1e3*(t_fb-t_fwd):.2f})")
    print(f"full step, no metrics       : {t_nom*1e3:8.2f} ms  (opt ≈ {1e3*(t_nom-t_fb):.2f})")
    print(f"full step, with metrics     : {t_full*1e3:8.2f} ms  (PSNR/SSIM ≈ {1e3*(t_full-t_nom):.2f})")

    # component grads
    cleaner = IterativeRefinement(64, 20, 3, dtype=jnp.bfloat16)
    lr_flat = lr.reshape(B * T, H, W, 3)

    @jax.jit
    def cleaner_fb(p, x):
        def f(p):
            y = cleaner.apply({"params": p["cleaner"]}, x)
            return jnp.mean(jnp.square(y.astype(jnp.float32)))

        return jax.value_and_grad(f)(p)

    t_cl = timed(cleaner_fb, params, lr_flat)
    print(f"cleaner fwd+bwd             : {t_cl*1e3:8.2f} ms")

    bvsr = BasicVSR(64, 30, 4, dtype=jnp.bfloat16)

    @jax.jit
    def bvsr_fb(p, x):
        def f(p):
            y = bvsr.apply({"params": p["basicvsr"]}, x)
            return jnp.mean(jnp.square(y.astype(jnp.float32)))

        return jax.value_and_grad(f)(p)

    t_bv = timed(bvsr_fb, params, lr)
    print(f"basicvsr fwd+bwd (incl flow): {t_bv*1e3:8.2f} ms")

    @jax.jit
    def flows_only(p, x):
        return bvsr.apply({"params": p["basicvsr"]}, x, method=BasicVSR.compute_flow)

    t_fl = timed(flows_only, params, lr)
    print(f"spynet flows fwd (stop-grad): {t_fl*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
