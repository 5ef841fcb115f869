from .node import NodeTypeEmbed
from .node_tensor import AppendVectorFieldEmbed
from .edge import (
    SphericalHarmonicEdgeAttrs,
    EdgeLengthNormalizer,
    BesselEdgeLengthEncoding,
    AddRadialCutoffToData,
    PolynomialCutoff,
)
from .utils import cutoff_dict_to_matrix, cutoff_matrix_to_dict

__all__ = [
    "NodeTypeEmbed",
    "AppendVectorFieldEmbed",
    "SphericalHarmonicEdgeAttrs",
    "EdgeLengthNormalizer",
    "BesselEdgeLengthEncoding",
    "AddRadialCutoffToData",
    "PolynomialCutoff",
    "cutoff_dict_to_matrix",
    "cutoff_matrix_to_dict",
]
