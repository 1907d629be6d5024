"""vsrlab_tpu — a TPU-native (JAX/XLA/Pallas) video super-resolution framework.

A from-scratch rebuild of the capabilities of the reference framework
(santurini/vsrlab) with a TPU-first architecture:

* functional Flax models + optax training steps under ``jit``/``shard_map``
* channels-last layouts everywhere: clips are ``(B, T, H, W, C)``, flows are
  ``(B, T, H, W, 2)`` with ``(x, y)`` displacement order
* kernel layer (``vsrlab_tpu.ops``) replacing the reference's CUDA-backed
  dependencies (``grid_sample``, ``deform_conv2d``, ``PixelShuffle``) with
  XLA/Pallas implementations and numeric oracles
* SPMD data/tensor parallelism over a ``jax.sharding.Mesh`` instead of
  NCCL/DDP (reference: src/core/utils.py:32-52,145-152)
"""

__version__ = "0.1.0"
