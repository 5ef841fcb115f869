from .base import NequIPDataModule
from .ase import ASEDataModule
from .named import (
    NPZSplitDataModule,
    sGDML_CCSD_DataModule,
    rMD17DataModule,
    MD22DataModule,
    NequIP3BPADataModule,
    TM23DataModule,
    SAMD23DataModule,
    WaterDataModule,
    COLLDataModule,
)

__all__ = [
    "NequIPDataModule",
    "ASEDataModule",
    "NPZSplitDataModule",
    "sGDML_CCSD_DataModule",
    "rMD17DataModule",
    "MD22DataModule",
    "NequIP3BPADataModule",
    "TM23DataModule",
    "SAMD23DataModule",
    "WaterDataModule",
    "COLLDataModule",
]
