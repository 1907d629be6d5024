"""Model zoo: VSR architectures and optical-flow networks.

Parity targets (reference): RealBasicVSR + BasicVSR
(src/vsr/models/RealBasicVSR/), VRT + TinyVRT (src/vsr/models/VRT/),
SpyNet / RAFT / IRR-PWC (src/optical_flow/models/).
"""

from vsrlab_tpu.models.spynet import SpyNet, SpyNetBasicModule
from vsrlab_tpu.models.basicvsr import BasicVSR
from vsrlab_tpu.models.realbasicvsr import RealBasicVSR
from vsrlab_tpu.models.unet_discriminator import UNetDiscriminator
from vsrlab_tpu.models.vrt import VRT, TinyVRT

__all__ = [
    "SpyNet",
    "SpyNetBasicModule",
    "BasicVSR",
    "RealBasicVSR",
    "UNetDiscriminator",
    "VRT",
    "TinyVRT",
]
