from .calculator import NequIPCalculator
from .md import MDDriver, NoseHoover, VelocityVerlet
from .pair_style import NequIPPairStyleWrapper

__all__ = [
    "NequIPCalculator",
    "MDDriver",
    "NoseHoover",
    "VelocityVerlet",
    "NequIPPairStyleWrapper",
]
