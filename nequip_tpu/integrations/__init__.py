from .calculator import NequIPCalculator
from .md import MDDriver, NoseHoover, VelocityVerlet, maxwell_boltzmann_velocities
from .pair_style import NequIPPairStyleWrapper
from .batched import NequIPBatchedInference

__all__ = [
    "NequIPCalculator",
    "MDDriver",
    "NoseHoover",
    "maxwell_boltzmann_velocities",
    "VelocityVerlet",
    "NequIPPairStyleWrapper",
    "NequIPBatchedInference",
]
