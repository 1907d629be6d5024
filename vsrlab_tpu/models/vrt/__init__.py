"""VRT: Video Restoration Transformer (Flax, channels-last).

Capability parity with the reference VRT family
(src/vsr/models/VRT/): temporal mutual-self window attention (TMSA),
U-shaped multi-scale stages with parallel flow-guided deformable
warping, and the RTMSA reconstruction trunk.
"""

from vsrlab_tpu.models.vrt.vrt import VRT, TinyVRT
from vsrlab_tpu.models.vrt.tmsa import TMSA, TMSAG, RTMSA
from vsrlab_tpu.models.vrt.window_attention import (
    WindowAttention,
    MlpGEGLU,
    window_partition,
    window_reverse,
    get_window_size,
    compute_mask,
)
from vsrlab_tpu.models.vrt.stage import Stage
from vsrlab_tpu.models.vrt.deform import FlowGuidedDeformAlign

__all__ = [
    "VRT",
    "TinyVRT",
    "TMSA",
    "TMSAG",
    "RTMSA",
    "Stage",
    "WindowAttention",
    "MlpGEGLU",
    "FlowGuidedDeformAlign",
    "window_partition",
    "window_reverse",
    "get_window_size",
    "compute_mask",
]
