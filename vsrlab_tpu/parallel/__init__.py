"""SPMD parallelism over a TPU device mesh.

Replaces the reference's NCCL/DDP distributed substrate
(reference src/core/utils.py:32-52,145-152,193-233) with JAX shardings:

* data parallelism = batch sharded over the ``data`` mesh axis; XLA
  inserts the gradient all-reduce over ICI (no DDP wrapper, no NCCL);
* per-process input sharding replaces ``DistributedSampler``;
* ``jax.process_index() == 0`` replaces "rank 0";
* the ``time`` axis shards long clips for sequence-parallel inference
  AND training (capability the reference lacks — SURVEY.md §2.8, §7.1);
  see :func:`clip_sharding` / :func:`shard_batch_sp`.
"""

from vsrlab_tpu.parallel.mesh import (
    create_mesh,
    batch_sharding,
    clip_sharding,
    initialize_distributed,
    replicated,
    shard_batch,
    shard_batch_sp,
    local_batch_slice,
    process_count,
    process_index,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "clip_sharding",
    "initialize_distributed",
    "replicated",
    "shard_batch",
    "shard_batch_sp",
    "local_batch_slice",
    "process_count",
    "process_index",
]
