"""Worker for the 2-process launcher test (run as a subprocess).

Brings up a local CPU ``jax.distributed`` cluster (gloo collectives),
builds the global DP mesh, assembles its per-process batch shard via
``shard_batch`` (``jax.make_array_from_process_local_data``), runs ONE
supervised train step, and writes the resulting params + metrics to
``<outdir>/proc{pid}.npz``. Usage:

    python tests/_dist_worker.py <pid> <nprocs> <port> <outdir>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nprocs, port, outdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    import numpy as np

    from vsrlab_tpu.parallel import (
        create_mesh,
        initialize_distributed,
        local_batch_slice,
        replicated,
        shard_batch,
    )

    initialize_distributed(f"localhost:{port}", nprocs, pid)
    assert jax.process_count() == nprocs
    n_global = jax.device_count()

    import jax.numpy as jnp
    import optax

    from vsrlab_tpu.models import RealBasicVSR
    from vsrlab_tpu.train import create_train_state, make_supervised_train_step

    b, t, h, w, s = 8, 2, 16, 16, 4
    rng = np.random.default_rng(0)
    lr_full = rng.random((b, t, h, w, 3)).astype(np.float32)
    hr_full = rng.random((b, t, h * s, w * s, 3)).astype(np.float32)

    model = RealBasicVSR(mid_channels=8, res_blocks=1, cleaning_blocks=1)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, t, h, w, 3)), tx
    )

    mesh = create_mesh({"data": n_global})
    sl = local_batch_slice(b)
    with mesh:
        state = jax.device_put(state, replicated(mesh))
        batch = shard_batch({"lr": lr_full[sl], "hr": hr_full[sl]}, mesh)
        step = make_supervised_train_step(model)
        state, metrics = step(state, batch)
        jax.block_until_ready(metrics)

    flat, _ = jax.tree_util.tree_flatten_with_path(jax.device_get(state.params))
    out = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    out["__loss"] = np.asarray(float(metrics["Loss"]))
    out["__psnr"] = np.asarray(float(metrics["PSNR"]))
    np.savez(os.path.join(outdir, f"proc{pid}.npz"), **out)
    print(f"worker {pid} done: loss={float(metrics['Loss']):.6f}", flush=True)


if __name__ == "__main__":
    main()
