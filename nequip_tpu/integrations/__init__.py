from .calculator import NequIPCalculator
from .md import MDDriver, NoseHoover, VelocityVerlet

__all__ = ["NequIPCalculator", "MDDriver", "NoseHoover", "VelocityVerlet"]
