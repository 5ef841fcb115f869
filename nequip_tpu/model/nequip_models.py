"""NequIP GNN model builders.

Parity: ``/root/reference/nequip/model/nequip_models.py`` — the same
architecture assembled from TPU-native modules:

    type_embed -> spherical harmonics -> edge length norm -> Bessel encoding
    -> x(2*pi/r_max^2) -> N x ConvNetLayer -> scalar readout MLP
    -> per-type scale/shift -> [pair potential] -> per-frame sum
    -> ForceStressOutput (jax.grad)

Size presets (S/M/L/XL) match the reference's foundation-model presets.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Sequence, Union

from ..data import _keys
from ..nn import (
    ApplyFactor,
    AtomwiseReduce,
    ConvNetLayer,
    ForceStressOutput,
    GraphModel,
    PerTypeScaleShift,
    ScalarMLP,
    SequentialGraphNetwork,
)
from ..nn.embedding import (
    BesselEdgeLengthEncoding,
    EdgeLengthNormalizer,
    NodeTypeEmbed,
    PolynomialCutoff,
    SphericalHarmonicEdgeAttrs,
)
from ..ops.irreps import Irrep, Irreps, MulIrrep
from .utils import model_builder

_NEQUIP_GNN_PRESETS = {
    "S": {"num_layers": 2, "l_max": 1, "num_features": [128, 64]},
    "M": {"num_layers": 4, "l_max": 2, "num_features": [128, 64, 32]},
    "L": {"num_layers": 6, "l_max": 3, "num_features": [128, 64, 32, 32]},
    "XL": {"num_layers": 6, "l_max": 4, "num_features": [320, 96, 64, 32, 32]},
}
_NEQUIP_GNN_STANDARD_PRESET = {
    "parity": False,
    "type_embed_num_features": 32,
    "radial_mlp_depth": 1,
    "radial_mlp_width": 128,
}


@model_builder
def PresetNequIPGNNModel(preset: str, type_names=None, **kwargs) -> GraphModel:
    """Build NequIPGNNModel from a named size preset (S/M/L/XL)."""
    preset = preset.upper()
    assert preset in _NEQUIP_GNN_PRESETS, (
        f"`preset` must be one of {list(_NEQUIP_GNN_PRESETS)}, got {preset!r}"
    )
    model_kwargs = {**_NEQUIP_GNN_STANDARD_PRESET, **_NEQUIP_GNN_PRESETS[preset]}
    model_kwargs.update(kwargs)
    return NequIPGNNModel(type_names=type_names, **model_kwargs)


@model_builder
def NequIPGNNModel(
    num_layers: int = 4,
    l_max: int = 1,
    parity: bool = True,
    num_features: Union[int, List[int]] = 32,
    type_embed_num_features: Optional[int] = None,
    radial_mlp_depth: int = 1,
    radial_mlp_width: int = 128,
    type_names=None,
    **kwargs,
) -> GraphModel:
    """The standard NequIP energy(+forces/stress) model.

    See the reference's docstring (``nequip_models.py:116-207``) — arguments
    and defaults are identical.
    """
    assert num_layers > 0

    if isinstance(num_features, int):
        num_features = [num_features] * (l_max + 1)
    assert len(num_features) == l_max + 1, (
        f"`num_features` must have l_max+1={l_max + 1} entries, got {num_features}"
    )
    type_embed_num_features = (
        type_embed_num_features if type_embed_num_features is not None else num_features[0]
    )

    feature_irreps_hidden = Irreps(
        [
            MulIrrep(num_features[l], Irrep(l, p))
            for l in range(l_max + 1)
            for p in ((1, -1) if parity else ((1,) if l % 2 == 0 else (-1,)))
        ]
    )
    feature_irreps_hidden_list = [feature_irreps_hidden] * (num_layers - 1)
    # the last conv layer outputs scalars only
    feature_irreps_hidden_list += [Irreps([(num_features[0], (0, 1))])]

    return FullNequIPGNNModel(
        irreps_edge_sh=l_max,
        type_embed_num_features=type_embed_num_features,
        feature_irreps_hidden=feature_irreps_hidden_list,
        radial_mlp_depth=[radial_mlp_depth] * num_layers,
        radial_mlp_width=[radial_mlp_width] * num_layers,
        type_names=type_names,
        **kwargs,
    )


@model_builder
def FullNequIPGNNModel(
    r_max: float,
    type_names: Sequence[str] = None,
    # convnet params
    radial_mlp_depth: Sequence[int] = (1,),
    radial_mlp_width: Sequence[int] = (8,),
    feature_irreps_hidden: Sequence[Union[str, Irreps]] = ("32x0e",),
    # irreps and dims
    irreps_edge_sh: Union[int, str, Irreps] = 1,
    type_embed_num_features: int = 32,
    categorical_graph_field_embed: Optional[List[Dict]] = None,
    # readout
    readout_mlp_hidden_layers_depth: int = 0,
    readout_mlp_hidden_layers_width: Optional[int] = None,
    readout_mlp_nonlinearity: Optional[str] = "silu",
    # edge length encoding
    per_edge_type_cutoff: Optional[Dict[str, Union[float, Dict[str, float]]]] = None,
    num_bessels: int = 8,
    bessel_trainable: bool = False,
    polynomial_cutoff_p: int = 6,
    # edge sum normalization
    avg_num_neighbors: Optional[Union[float, Dict[str, float]]] = None,
    # per atom energy params
    per_type_energy_scales: Optional[Union[float, Dict[str, float]]] = None,
    per_type_energy_shifts: Optional[Union[float, Dict[str, float]]] = None,
    per_type_energy_scales_trainable: bool = False,
    per_type_energy_shifts_trainable: bool = False,
    pair_potential: Optional[Dict] = None,
    # derivatives
    do_derivatives: bool = True,
    # developmental params
    convnet_sc: bool = True,
    learnable_shift: bool = False,
    convnet_resnet: bool = False,
    convnet_nonlinearity_type: str = "gate",
    convnet_nonlinearity_scalars: Dict[str, str] = {"e": "silu", "o": "tanh"},
    convnet_nonlinearity_gates: Dict[str, str] = {"e": "silu", "o": "tanh"},
    tp_impl: str = "xla",
    remat_conv: bool = False,
    remat_force: bool = False,
) -> GraphModel:
    """Fully-explicit NequIP GNN builder (one config entry per layer)."""
    type_names = list(type_names)
    assert all(tn.isalnum() for tn in type_names), (
        "`type_names` must be alphanumeric"
    )
    assert not learnable_shift or (convnet_sc or convnet_resnet)
    assert (
        len(radial_mlp_depth) == len(radial_mlp_width) == len(feature_irreps_hidden)
    )
    num_layers = len(radial_mlp_depth)
    assert all(
        mi.ir.l == 0 for mi in Irreps(feature_irreps_hidden[-1])
    ), "last convnet layer must output scalars only"

    # === embeddings ===
    type_embed = NodeTypeEmbed(
        type_names=type_names,
        num_features=type_embed_num_features,
        categorical_graph_field_embed=categorical_graph_field_embed,
    )
    spharm = SphericalHarmonicEdgeAttrs(
        irreps_edge_sh=irreps_edge_sh, irreps_in=type_embed.irreps_out
    )
    edge_norm = EdgeLengthNormalizer(
        r_max=r_max,
        type_names=type_names,
        per_edge_type_cutoff=per_edge_type_cutoff,
        irreps_in=spharm.irreps_out,
    )
    bessel_encode = BesselEdgeLengthEncoding(
        cutoff=PolynomialCutoff(polynomial_cutoff_p),
        num_bessels=num_bessels,
        trainable=bessel_trainable,
        irreps_in=edge_norm.irreps_out,
    )
    # backwards-compatible Bessel prefactor (nequip_models.py:317-322)
    factor = ApplyFactor(
        in_field=_keys.EDGE_EMBEDDING_KEY,
        factor=(2 * math.pi) / (r_max * r_max),
        irreps_in=bessel_encode.irreps_out,
    )

    modules = {
        "type_embed": type_embed,
        "spharm": spharm,
        "edge_norm": edge_norm,
        "bessel_encode": bessel_encode,
        "factor": factor,
    }
    prev_irreps_out = factor.irreps_out

    # === convnet layers ===
    for layer_i in range(num_layers):
        conv = ConvNetLayer(
            irreps_in=prev_irreps_out,
            feature_irreps_hidden=feature_irreps_hidden[layer_i],
            convolution_kwargs={
                "radial_mlp_depth": radial_mlp_depth[layer_i],
                "radial_mlp_width": radial_mlp_width[layer_i],
                # no self-connection on the first layer ensures the isolated
                # atom limit (type embedding alone carries no energy)
                "use_sc": convnet_sc
                if learnable_shift
                else (layer_i != 0) and convnet_sc,
                "is_first_layer": layer_i == 0,
                "avg_num_neighbors": avg_num_neighbors,
                "type_names": type_names,
                "tp_impl": tp_impl,
            },
            resnet=convnet_resnet
            if learnable_shift
            else (layer_i != 0) and convnet_resnet,
            remat=remat_conv,
            nonlinearity_type=convnet_nonlinearity_type,
            nonlinearity_scalars=convnet_nonlinearity_scalars,
            nonlinearity_gates=convnet_nonlinearity_gates,
        )
        prev_irreps_out = conv.irreps_out
        modules[f"layer{layer_i}_convnet"] = conv

    # === readout ===
    if readout_mlp_hidden_layers_width is None:
        readout_mlp_hidden_layers_width = Irreps(feature_irreps_hidden[-1]).dim
    modules["per_atom_energy_readout"] = ScalarMLP(
        output_dim=1,
        hidden_layers_depth=readout_mlp_hidden_layers_depth,
        hidden_layers_width=readout_mlp_hidden_layers_width,
        nonlinearity=readout_mlp_nonlinearity,
        bias=False,
        forward_weight_init=True,
        field=_keys.NODE_FEATURES_KEY,
        out_field=_keys.PER_ATOM_ENERGY_KEY,
        irreps_in=prev_irreps_out,
    )
    modules["per_type_energy_scale_shift"] = PerTypeScaleShift(
        type_names=type_names,
        field=_keys.PER_ATOM_ENERGY_KEY,
        out_field=_keys.PER_ATOM_ENERGY_KEY,
        scales=per_type_energy_scales,
        shifts=per_type_energy_shifts,
        scales_trainable=per_type_energy_scales_trainable,
        shifts_trainable=per_type_energy_shifts_trainable,
        irreps_in=modules["per_atom_energy_readout"].irreps_out,
    )

    energy_model = SequentialGraphNetwork(modules)
    energy_model = _append_energy_modules(
        energy_model, type_names=type_names, pair_potential=pair_potential
    )
    wrapped = ForceStressOutput(energy_model, do_derivatives, remat=remat_force)
    return GraphModel(
        wrapped,
        type_names=type_names,
        r_max=r_max,
        per_edge_type_cutoff=per_edge_type_cutoff,
    )


def _append_energy_modules(model, type_names, pair_potential=None):
    """Pair potential + total-energy reduction.

    Parity: ``model/energy_modules.py:10-35``.
    """
    if pair_potential is not None:
        from ..utils.config import instantiate

        pp = instantiate(
            pair_potential, type_names=type_names, irreps_in=model.irreps_out
        )
        model.append("pair_potential", pp)
    model.append(
        "total_energy_sum",
        AtomwiseReduce(
            irreps_in=model.irreps_out,
            reduce="sum",
            field=_keys.PER_ATOM_ENERGY_KEY,
            out_field=_keys.TOTAL_ENERGY_KEY,
        ),
    )
    return model
