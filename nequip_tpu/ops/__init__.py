from .irreps import Irrep, Irreps, MulIrrep, tp_path_exists
from .spherical import spherical_harmonics, spherical_harmonics_np, sh_dim
from .cg import real_clebsch_gordan, cg_component_normalized, wigner_D, irrep_D, random_rotation
from .tensor_product import (
    TensorProduct,
    Instruction,
    fully_connected_tensor_product,
    uvu_instructions,
)
from .linear import Linear
from .gate import Gate, NormActivation
from .scatter import scatter_sum, scatter_mean, masked_gather
from .radial import polynomial_cutoff, bessel_basis, sinc
from .mlp import ScalarMLP
from .activations import normalized_activation, raw_activation, shifted_softplus
from .device_nl import device_neighbor_list, suggest_grid_dims

__all__ = [
    "Irrep",
    "Irreps",
    "MulIrrep",
    "tp_path_exists",
    "spherical_harmonics",
    "spherical_harmonics_np",
    "sh_dim",
    "real_clebsch_gordan",
    "cg_component_normalized",
    "wigner_D",
    "irrep_D",
    "random_rotation",
    "TensorProduct",
    "Instruction",
    "fully_connected_tensor_product",
    "uvu_instructions",
    "Linear",
    "Gate",
    "NormActivation",
    "scatter_sum",
    "scatter_mean",
    "masked_gather",
    "polynomial_cutoff",
    "bessel_basis",
    "sinc",
    "ScalarMLP",
    "normalized_activation",
    "raw_activation",
    "shifted_softplus",
    "device_neighbor_list",
    "suggest_grid_dims",
]
