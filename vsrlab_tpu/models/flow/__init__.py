"""Optical-flow model zoo (reference src/optical_flow/models/).

* :class:`RAFT` — iterative all-pairs-correlation flow (small + basic),
  with torch checkpoint import for the reference's ``raft-small.pth``.
* :class:`IRRPWCNet` — PWC-Net with iterative residual refinement.
* :class:`SpyNetProgressive` — the trainable per-level SpyNet used by
  the progressive curriculum trainer, plus ``GConf`` level sizing.
"""

from vsrlab_tpu.models.flow.raft import RAFT, load_torch_raft
from vsrlab_tpu.models.flow.irr import IRRPWCNet
from vsrlab_tpu.models.flow.spynet_progressive import (
    GConf,
    SpyNetProgressive,
    MAX_G,
)

__all__ = [
    "RAFT",
    "load_torch_raft",
    "IRRPWCNet",
    "SpyNetProgressive",
    "GConf",
    "MAX_G",
]
