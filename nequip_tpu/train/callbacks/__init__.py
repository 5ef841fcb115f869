from .base import Callback
from .loss_coeff_scheduler import LossCoefficientScheduler, LinearLossCoefficientScheduler
from .loss_coeff_monitor import LossCoefficientMonitor
from .softadapt import SoftAdapt
from .write_xyz import TestTimeXYZFileWriter
from .tf32_scheduler import TF32Scheduler
from .training_stats import TrainingStatsMonitor
from .wandb_watch import WandbWatch

__all__ = [
    "Callback",
    "LossCoefficientScheduler",
    "LinearLossCoefficientScheduler",
    "LossCoefficientMonitor",
    "SoftAdapt",
    "TestTimeXYZFileWriter",
    "TF32Scheduler",
    "TrainingStatsMonitor",
    "WandbWatch",
]
