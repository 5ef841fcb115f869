from .base import AtomicDataset, InMemoryDataset, RandomSplitDataset, SubsetDataset
from .synthetic import LJTestDataset, EMTTestDataset, lj_reference
from .file_datasets import NPZDataset, HDF5Dataset, ASEDataset, LMDBDataset
from .shard import ShardDataset

__all__ = [
    "AtomicDataset",
    "InMemoryDataset",
    "RandomSplitDataset",
    "SubsetDataset",
    "LJTestDataset",
    "EMTTestDataset",
    "lj_reference",
    "NPZDataset",
    "HDF5Dataset",
    "ASEDataset",
    "LMDBDataset",
    "ShardDataset",
]
