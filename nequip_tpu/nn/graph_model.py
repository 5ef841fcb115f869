"""GraphModel: the top-level model wrapper.

Parity: ``GraphModel`` (``/root/reference/nequip/nn/graph_model.py:37-155``):
filters incoming data down to the model's declared input fields, and carries
the model metadata dictionary (r_max, type names, dtype, per-edge-type
cutoffs) that deployment artifacts embed.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from ..data import _keys
from ..utils.dtype import dtype_to_name
from .module import GraphModule, Params

# fields always allowed through to the model (index/bookkeeping fields)
_ALWAYS_INPUT_FIELDS = (
    _keys.POSITIONS_KEY,
    _keys.EDGE_INDEX_KEY,
    _keys.EDGE_CELL_SHIFT_KEY,
    _keys.CELL_KEY,
    _keys.PBC_KEY,
    _keys.BATCH_KEY,
    _keys.NUM_NODES_KEY,
    _keys.ATOM_TYPE_KEY,
    _keys.ATOMIC_NUMBERS_KEY,
    _keys.NODE_MASK_KEY,
    _keys.EDGE_MASK_KEY,
    _keys.FRAME_MASK_KEY,
    _keys.EDGE_TRANSPOSE_PERM_KEY,
    _keys.NUM_LOCAL_GHOST_NODES_KEY,
    _keys.EDGE_VECTORS_KEY,
)


def _walk_uses_pallas(module, _seen=None) -> bool:
    """True when any (recursively reachable) submodule selects the Pallas
    TP-scatter kernels — the signal that the edge stream should be
    pre-laid-out at the model boundary."""
    _seen = set() if _seen is None else _seen
    if id(module) in _seen:
        return False
    _seen.add(id(module))
    if getattr(module, "impl", None) in ("pallas", "pallas_fused"):
        return True
    children = []
    if isinstance(module, GraphModule):
        children = list(vars(module).values())
    for v in children:
        if isinstance(v, dict):
            vs = v.values()
        elif isinstance(v, (list, tuple)):
            vs = v
        else:
            vs = (v,)
        for c in vs:
            if isinstance(c, GraphModule) or hasattr(c, "impl"):
                if _walk_uses_pallas(c, _seen):
                    return True
    return False


class GraphModel(GraphModule):
    def __init__(
        self,
        model: GraphModule,
        model_config: Optional[dict] = None,
        type_names: Optional[List[str]] = None,
        r_max: Optional[float] = None,
        per_edge_type_cutoff: Optional[dict] = None,
    ):
        super().__init__()
        self.model = model
        self.model_config = dict(model_config or {})
        self.type_names = list(type_names) if type_names is not None else None
        self.r_max = r_max
        self.per_edge_type_cutoff = per_edge_type_cutoff

        self._init_irreps(
            irreps_in=dict(model.irreps_in), irreps_out=dict(model.irreps_out)
        )
        self.input_fields = tuple(
            dict.fromkeys(list(_ALWAYS_INPUT_FIELDS) + list(model.irreps_in.keys()))
        )
        # pre-lay-out the edge stream at the model boundary whenever any
        # interaction layer runs the Pallas kernel family: per-edge tensors
        # (SH, radial embedding, radial weights) are then computed directly
        # in kernel slot order and every take_idx-keyed gather/scatter
        # inside the kernels collapses away (ops/pallas/tp_scatter.py
        # relayout_edge_stream)
        self.uses_pallas_kernels = _walk_uses_pallas(model)

    @property
    def metadata(self) -> Dict[str, str]:
        """String metadata for deployment artifacts (``graph_model.py:99-146``)."""
        md = {
            "model_dtype": dtype_to_name(self.model_dtype),
        }
        if self.r_max is not None:
            md["r_max"] = str(self.r_max)
        if self.type_names is not None:
            md["num_types"] = str(len(self.type_names))
            md["type_names"] = " ".join(self.type_names)
        if self.per_edge_type_cutoff is not None:
            from .embedding.utils import cutoff_dict_to_matrix

            mat = cutoff_dict_to_matrix(
                self.per_edge_type_cutoff, self.type_names, self.r_max
            )
            md["per_edge_type_cutoff"] = " ".join(str(x) for x in mat.reshape(-1))
        md.update(self.model.metadata())
        return md

    def init(self, rng) -> Params:
        return self.model.init(rng)

    def frozen_param_paths(self):
        return self.model.frozen_param_paths()

    def __call__(self, params: Params, data: dict) -> dict:
        inputs = {k: data[k] for k in self.input_fields if k in data}
        # precomputed fused-kernel edge layouts (ops/pallas/tp_scatter.py
        # layout_key) ride along: pure functions of the edge list that MD
        # drivers compute once per neighborlist rebuild
        inputs.update(
            {k: v for k, v in data.items() if k.startswith("__edge_layout_")}
        )
        if self.uses_pallas_kernels:
            from ..ops.pallas.tp_scatter import relayout_edge_stream

            inputs = relayout_edge_stream(inputs)
        return self.model(params, inputs)

    def __repr__(self):
        return f"GraphModel(\n  {self.model!r}\n)"
