"""2-process launcher coverage (VERDICT r2 missing #3 / next #5).

Spawns two subprocesses that ``initialize_distributed`` against a
localhost coordinator (CPU platform, 4 virtual devices each → one global
8-device DP mesh, gloo collectives), assemble per-process batch shards
via ``shard_batch``/``jax.make_array_from_process_local_data``, and run
one supervised DP train step. Asserts both processes agree and the
result matches the same step run single-process on this host's 8-device
mesh. Reference equivalent: torchrun/mpirun env detection + NCCL
rendezvous + DistributedSampler (src/core/utils.py:32-52,199-200).
"""

import socket
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parents[1]


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    outdir = tmp_path_factory.mktemp("dist")
    port = _free_port()
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(REPO / "tests" / "_dist_worker.py"),
                str(pid),
                "2",
                str(port),
                str(outdir),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"
    return {
        pid: dict(np.load(outdir / f"proc{pid}.npz")) for pid in range(2)
    }, logs


def test_workers_agree(worker_results):
    res, _ = worker_results
    a, b = res[0], res[1]
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-6, atol=1e-7, err_msg=k)


def test_matches_single_process(worker_results):
    """The 2-process global-mesh step equals the same step on this host's
    own 8-device mesh (same 8-way partitioning, identical inputs)."""
    import optax

    from vsrlab_tpu.models import RealBasicVSR
    from vsrlab_tpu.parallel import create_mesh, replicated, shard_batch
    from vsrlab_tpu.train import create_train_state, make_supervised_train_step

    res, _ = worker_results
    dist = res[0]

    b, t, h, w, s = 8, 2, 16, 16, 4
    rng = np.random.default_rng(0)
    batch_np = {
        "lr": rng.random((b, t, h, w, 3)).astype(np.float32),
        "hr": rng.random((b, t, h * s, w * s, 3)).astype(np.float32),
    }
    model = RealBasicVSR(mid_channels=8, res_blocks=1, cleaning_blocks=1)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, t, h, w, 3)), tx
    )
    mesh = create_mesh({"data": 8})
    with mesh:
        state = jax.device_put(state, replicated(mesh))
        batch = shard_batch(batch_np, mesh)
        step = make_supervised_train_step(model)
        state, metrics = step(state, batch)

    np.testing.assert_allclose(
        float(metrics["Loss"]), float(dist["__loss"]), rtol=1e-6
    )
    flat, _ = jax.tree_util.tree_flatten_with_path(jax.device_get(state.params))
    for k, v in flat:
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(v), dist[key], rtol=1e-5, atol=1e-6, err_msg=key
        )
