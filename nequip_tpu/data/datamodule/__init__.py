from .base import NequIPDataModule
from .ase import ASEDataModule

__all__ = ["NequIPDataModule", "ASEDataModule"]
