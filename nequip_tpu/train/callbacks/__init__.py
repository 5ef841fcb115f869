from .base import Callback
from .loss_coeff_scheduler import LossCoefficientScheduler, LinearLossCoefficientScheduler
from .loss_coeff_monitor import LossCoefficientMonitor
from .softadapt import SoftAdapt
from .write_xyz import TestTimeXYZFileWriter

__all__ = [
    "Callback",
    "LossCoefficientScheduler",
    "LinearLossCoefficientScheduler",
    "LossCoefficientMonitor",
    "SoftAdapt",
    "TestTimeXYZFileWriter",
]
