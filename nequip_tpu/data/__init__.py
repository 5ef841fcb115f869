from . import _keys
from ._key_registry import (
    register_fields,
    deregister_fields,
    get_field_type,
    _register_field_prefix,
    ABBREV,
)
from . import atomic_data_dict as AtomicDataDict
from .atomic_data_dict import (
    from_dict,
    batched_from_list,
    frame_from_batched,
    without_nodes,
    pad_batch,
    to_device,
    with_batch_,
    num_frames,
    num_nodes,
    num_edges,
    round_up,
)
from .neighborlist import neighbor_list, compute_neighborlist_, register_neighborlist_backend
from .loader import DataLoader
from .modifier import BaseModifier, PerAtomModifier, MappedFieldModifier, EdgeLengths, NumNeighbors
from .stats_manager import (
    DataStatisticsManager,
    CommonDataStatisticsManager,
    EnergyOnlyDataStatisticsManager,
)
from .datamodule import NequIPDataModule, ASEDataModule
from ._sampler import PartialSampler

__all__ = [
    "_keys",
    "AtomicDataDict",
    "register_fields",
    "deregister_fields",
    "get_field_type",
    "ABBREV",
    "from_dict",
    "batched_from_list",
    "frame_from_batched",
    "without_nodes",
    "pad_batch",
    "to_device",
    "with_batch_",
    "num_frames",
    "num_nodes",
    "num_edges",
    "round_up",
    "neighbor_list",
    "compute_neighborlist_",
    "register_neighborlist_backend",
    "DataLoader",
    "BaseModifier",
    "PerAtomModifier",
    "MappedFieldModifier",
    "EdgeLengths",
    "NumNeighbors",
    "DataStatisticsManager",
    "CommonDataStatisticsManager",
    "EnergyOnlyDataStatisticsManager",
    "NequIPDataModule",
    "ASEDataModule",
    "PartialSampler",
]
