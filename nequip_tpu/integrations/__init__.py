from .calculator import NequIPCalculator
from .md import MDDriver, NoseHoover, VelocityVerlet
from .pair_style import NequIPPairStyleWrapper
from .batched import NequIPBatchedInference

__all__ = [
    "NequIPCalculator",
    "MDDriver",
    "NoseHoover",
    "VelocityVerlet",
    "NequIPPairStyleWrapper",
    "NequIPBatchedInference",
]
