"""GAN train step on the chip at the bench shape.

Completes the trainer performance story (supervised step profiled in
profile_train_step.py; SPyNet per-level steps are tiny): one jitted
GAN step = generator fwd + pixel/perceptual/adversarial losses + grads
+ adam, then discriminator real/fake BCE + grads + adam (reference hot
loop src/train_gan.py:89-133, collapsed into one program here).

Measures the full step, the frozen-generator variant
(epoch <= freeze_epochs — reference train_gan.py:115-117), and the
no-perceptual ablation so the VGG cost is explicit.

Run: python scripts/profile_gan_step.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

from vsrlab_tpu.core.perceptual import PerceptualLoss  # noqa: E402
from vsrlab_tpu.models import RealBasicVSR, UNetDiscriminator  # noqa: E402
from vsrlab_tpu.train.gan import make_gan_train_step  # noqa: E402
from vsrlab_tpu.train.state import create_train_state  # noqa: E402
from vsrlab_tpu.utils import best_time, enable_compilation_cache  # noqa: E402

B, T, H, W, S = 4, 6, 64, 64, 4


def timed(step, g, d, batch, iters=5):
    def call_and_sync(n):
        gi, di, mm = g, d, None
        for _ in range(n):
            gi, di, mm = step(gi, di, batch)
        float(mm["Loss"])

    return best_time(call_and_sync, iters)


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(2)
    batch = {
        "lr": jnp.asarray(rng.random((B, T, H, W, 3)), jnp.float32),
        "hr": jnp.asarray(rng.random((B, T, H * S, W * S, 3)), jnp.float32),
    }
    model = RealBasicVSR(
        mid_channels=64, res_blocks=30, cleaning_blocks=20, dtype=jnp.bfloat16
    )
    disc = UNetDiscriminator(mid_channels=64, dtype=jnp.bfloat16)
    tx = lambda: optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
    g_state = create_train_state(model, jax.random.PRNGKey(0), batch["lr"], tx())
    d_state = create_train_state(
        disc,
        jax.random.PRNGKey(1),
        jnp.zeros((B * T, H * S, W * S, 3), jnp.float32),
        tx(),
    )
    perceptual = PerceptualLoss(weight=1e-2)

    for label, perc, upd in (
        ("full step (G+D, perceptual)", perceptual, True),
        ("frozen generator (D only)", perceptual, False),
        ("no perceptual", None, True),
    ):
        step = make_gan_train_step(model, disc, perc, 2e-5, upd, donate=False)
        dt = timed(step, g_state, d_state, batch)
        print(f"{label:32s} {dt*1e3:7.1f} ms  ({B*T/dt:.1f} frames/s)")


if __name__ == "__main__":
    main()
