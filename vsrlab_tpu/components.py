"""Component registry: maps config ``_target_`` names to implementations.

Importing this module populates :data:`vsrlab_tpu.core.config.REGISTRY`
with every instantiable component (models, datasets, optimizers,
schedules, loggers) — the registry-based replacement for hydra's
import-by-string ``_target_`` resolution (reference
src/core/utils.py:92-233).
"""

from __future__ import annotations

import optax

from vsrlab_tpu.core import schedulers
from vsrlab_tpu.core.config import register
from vsrlab_tpu.core.loggers import JsonlLogger, WandbLogger, build_logger
from vsrlab_tpu.data import DatasetVSR, SyntheticVSR, ValDatasetVSR, VideoDatasetVSR
from vsrlab_tpu.models import (
    VRT,
    BasicVSR,
    RealBasicVSR,
    SpyNet,
    TinyVRT,
    UNetDiscriminator,
)

# models
register("RealBasicVSR", RealBasicVSR)
register("BasicVSR", BasicVSR)
register("SpyNet", SpyNet)
register("UNetDiscriminator", UNetDiscriminator)
register("VRT", VRT)
register("TinyVRT", TinyVRT)

from vsrlab_tpu.models.flow import IRRPWCNet, RAFT, SpyNetProgressive  # noqa: E402

register("RAFT", RAFT)
register("IRRPWCNet", IRRPWCNet)
register("SpyNetProgressive", SpyNetProgressive)

from vsrlab_tpu.data.flow_dataset import FlowDataset, SyntheticFlowDataset  # noqa: E402

register("FlowDataset", FlowDataset)
register("SyntheticFlowDataset", SyntheticFlowDataset)

# datasets
register("DatasetVSR", DatasetVSR)
register("ValDatasetVSR", ValDatasetVSR)
register("SyntheticVSR", SyntheticVSR)
register("VideoDatasetVSR", VideoDatasetVSR)
register("vsrlab.vsr.dataset.DatasetVSR", DatasetVSR)
register("vsrlab.vsr.dataset.ValDatasetVSR", ValDatasetVSR)

# losses (config-instantiable; reference conf/train/gan.yaml)
from vsrlab_tpu.core.losses import (  # noqa: E402
    LossPipeline,
    OpticalFlowConsistency,
    adversarial_loss,
    charbonnier_loss,
    epe_loss,
    l1_loss,
)
from vsrlab_tpu.core.perceptual import PerceptualLoss  # noqa: E402

register("PerceptualLoss", PerceptualLoss)
register("vsrlab.core.losses.PerceptualLoss", PerceptualLoss)
register("AdversarialLoss", lambda weight=2e-5: lambda x, target, is_disc=False: adversarial_loss(x, target, is_disc, weight))
register("vsrlab.core.losses.AdversarialLoss", lambda weight=2e-5: lambda x, target, is_disc=False: adversarial_loss(x, target, is_disc, weight))
register("CharbonnierLoss", lambda eps=1e-9: lambda x, y: charbonnier_loss(x, y, eps))
register("vsrlab.core.losses.CharbonnierLoss", lambda eps=1e-9: lambda x, y: charbonnier_loss(x, y, eps))
register("WL1Loss", lambda weight=1.0: lambda x, y: l1_loss(x, y, weight))
register("EPELoss", lambda: epe_loss)
register("OpticalFlowConsistency", OpticalFlowConsistency)
register("LossPipeline", LossPipeline)

# loggers
register("Logger", build_logger)
register("JsonlLogger", JsonlLogger)
register("WandbLogger", WandbLogger)
register("vsrlab.core.loggers.WandbLogger", build_logger)


def _adam_factory(**kw):
    return ("adam", kw)


def _adamw_factory(**kw):
    return ("adamw", kw)


def _sgd_factory(**kw):
    return ("sgd", kw)


# optimizers resolve to (name, kwargs) specs; vsrlab_tpu.train.builders
# combines them with the schedule into one optax chain
register("adam", _adam_factory)
register("adamw", _adamw_factory)
register("sgd", _sgd_factory)

# metrics (config surface: conf/train/default.yaml `metric:` node)
from vsrlab_tpu.core.metrics import MetricCollection  # noqa: E402

register("MetricCollection", MetricCollection)
register("vsrlab.core.metrics.MetricCollection", MetricCollection)

# schedules
register("cosine", lambda **kw: ("cosine", kw))
register("cosine_warmup", lambda **kw: ("cosine_warmup", kw))
register(
    "vsrlab.core.schedulers.CosineAnnealingLinearWarmup",
    lambda **kw: ("cosine_warmup", kw),
)
