from .nequip_models import NequIPGNNModel, FullNequIPGNNModel, PresetNequIPGNNModel
from .utils import model_builder
from .pair_potential import ZBLPairPotential

__all__ = [
    "NequIPGNNModel",
    "FullNequIPGNNModel",
    "PresetNequIPGNNModel",
    "model_builder",
    "ZBLPairPotential",
]
