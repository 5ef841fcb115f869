from .module import GraphModule, SequentialGraphNetwork, replace_submodules
from .graph_model import GraphModel
from .graph_utils import with_edge_vectors, with_edge_types
from .interaction_block import InteractionBlock
from .convnetlayer import ConvNetLayer
from .tp_scatter import TensorProductScatter
from .atomwise import AtomwiseLinear, AtomwiseOperation, AtomwiseReduce, PerTypeScaleShift
from .grad_output import ForceStressOutput, PartialForceOutput
from .scalar_mlp import ScalarMLP
from .norm import AvgNumNeighborsNorm
from .misc import ApplyFactor, Concat, SaveForOutput
from .pair_potential import ZBL, LennardJones
from .ghost_exchange import NoOpGhostExchange
from .model_modifier_utils import model_modifier, get_all_modifiers
from . import embedding

__all__ = [
    "GraphModule",
    "SequentialGraphNetwork",
    "replace_submodules",
    "GraphModel",
    "with_edge_vectors",
    "with_edge_types",
    "InteractionBlock",
    "ConvNetLayer",
    "TensorProductScatter",
    "AtomwiseLinear",
    "AtomwiseOperation",
    "AtomwiseReduce",
    "PerTypeScaleShift",
    "ForceStressOutput",
    "PartialForceOutput",
    "ScalarMLP",
    "AvgNumNeighborsNorm",
    "ApplyFactor",
    "Concat",
    "SaveForOutput",
    "ZBL",
    "LennardJones",
    "NoOpGhostExchange",
    "model_modifier",
    "get_all_modifiers",
    "embedding",
]
