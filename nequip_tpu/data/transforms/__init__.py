from .neighborlist import NeighborListTransform, SortedNeighborListTransform, NeighborListPruneTransform
from .type_mapper import ChemicalSpeciesToAtomTypeMapper
from .stress_utils import VirialToStressTransform, StressSignFlipTransform, AddNaNStressTransform
from .cell_utils import NonPeriodicCellTransform
from .dataset import DatasetIndexTransform

__all__ = [
    "NeighborListTransform",
    "SortedNeighborListTransform",
    "NeighborListPruneTransform",
    "ChemicalSpeciesToAtomTypeMapper",
    "VirialToStressTransform",
    "StressSignFlipTransform",
    "AddNaNStressTransform",
    "NonPeriodicCellTransform",
    "DatasetIndexTransform",
]
