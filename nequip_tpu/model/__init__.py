from .nequip_models import NequIPGNNModel, FullNequIPGNNModel, PresetNequIPGNNModel
from .utils import model_builder
from .pair_potential import ZBLPairPotential
from .saved_models import (
    ModelFromCheckpoint,
    ModelFromPackage,
    load_saved_model,
    data_dict_from_checkpoint,
)
from .e3nn_import import export_to_e3nn_npz, import_e3nn_npz
from .modify_utils import modify
from .inference_models import (
    load_compiled_model,
    save_compiled_model,
    validate_artifact,
    CompiledModel,
)

__all__ = [
    "import_e3nn_npz",
    "export_to_e3nn_npz",
    "NequIPGNNModel",
    "FullNequIPGNNModel",
    "PresetNequIPGNNModel",
    "model_builder",
    "ZBLPairPotential",
    "ModelFromCheckpoint",
    "ModelFromPackage",
    "load_saved_model",
    "data_dict_from_checkpoint",
    "modify",
    "load_compiled_model",
    "save_compiled_model",
    "validate_artifact",
    "CompiledModel",
]
