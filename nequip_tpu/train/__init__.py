from .metrics_manager import (
    MetricsManager,
    EnergyForceLoss,
    EnergyForceMetrics,
    EnergyForceStressLoss,
    EnergyForceStressMetrics,
)
from .state import TrainState
from .training_module import (
    NequIPTrainModule,
    EMATrainModule,
    NequIPLightningModule,
    EMALightningModule,
)
from .trainer import Trainer
from .muon import muon, muon_adam, zeropower_via_newtonschulz5
from .schedulefree import ScheduleFreeTrainModule, ScheduleFreeLightningModule
from .config_module import (
    ConFIGTrainModule,
    EMAConFIGTrainModule,
    ConFIGLightningModule,
    EMAConFIGLightningModule,
)
from .lr_scheduler import (
    LRScheduler,
    ConstantLR,
    StepLR,
    MultiStepLR,
    ExponentialLR,
    LinearLR,
    CosineAnnealingLR,
    ReduceLROnPlateau,
    SequentialLR,
    ChainedScheduler,
    build_scheduler,
)
from .checkpoint import save_checkpoint, load_checkpoint, state_from_payload
from .ema import ema_update
from . import callbacks

__all__ = [
    "MetricsManager",
    "EnergyForceLoss",
    "EnergyForceMetrics",
    "EnergyForceStressLoss",
    "EnergyForceStressMetrics",
    "TrainState",
    "NequIPTrainModule",
    "EMATrainModule",
    "NequIPLightningModule",
    "EMALightningModule",
    "Trainer",
    "muon",
    "muon_adam",
    "zeropower_via_newtonschulz5",
    "ScheduleFreeTrainModule",
    "ScheduleFreeLightningModule",
    "ConFIGTrainModule",
    "EMAConFIGTrainModule",
    "ConFIGLightningModule",
    "EMAConFIGLightningModule",
    "LRScheduler",
    "ConstantLR",
    "StepLR",
    "MultiStepLR",
    "ExponentialLR",
    "LinearLR",
    "CosineAnnealingLR",
    "ReduceLROnPlateau",
    "SequentialLR",
    "ChainedScheduler",
    "build_scheduler",
    "save_checkpoint",
    "load_checkpoint",
    "state_from_payload",
    "ema_update",
    "callbacks",
]
