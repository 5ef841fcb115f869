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
    "save_checkpoint",
    "load_checkpoint",
    "state_from_payload",
    "ema_update",
    "callbacks",
]
