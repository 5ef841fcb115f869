"""Field-type registry: classify AtomicDataDict fields for batching/padding.

Mirrors the behavior of ``/root/reference/nequip/data/_key_registry.py``
(register/deregister, graph/node/edge/long/cartesian categories, prefix
re-registration, abbreviations).  The TPU framework uses the categories to
decide padding axes: graph fields pad to the frame capacity, node fields to
the node capacity, edge fields to the edge capacity.
"""

from typing import Dict, Sequence, Set

from . import _keys

_DEFAULT_LONG_FIELDS: Set[str] = {
    _keys.EDGE_INDEX_KEY,
    _keys.EDGE_TYPE_KEY,
    _keys.ATOMIC_NUMBERS_KEY,
    _keys.ATOM_TYPE_KEY,
    _keys.BATCH_KEY,
    _keys.NUM_NODES_KEY,
    _keys.DATASET_KEY,
    _keys.NUM_LOCAL_GHOST_NODES_KEY,
    _keys.EDGE_TRANSPOSE_PERM_KEY,
    _keys.TOTAL_CHARGE_KEY,
    _keys.TOTAL_SPIN_KEY,
}
_DEFAULT_GRAPH_FIELDS: Set[str] = {
    _keys.TOTAL_ENERGY_KEY,
    _keys.FREE_ENERGY_KEY,
    _keys.STRESS_KEY,
    _keys.VIRIAL_KEY,
    _keys.PBC_KEY,
    _keys.CELL_KEY,
    _keys.NUM_NODES_KEY,
    _keys.TOTAL_MAGMOM_KEY,
    _keys.DIPOLE_KEY,
    _keys.POLARIZATION_KEY,
    _keys.DIELECTRIC_KEY,
    _keys.DATASET_KEY,
    _keys.FRAME_MASK_KEY,
    _keys.TOTAL_CHARGE_KEY,
    _keys.TOTAL_SPIN_KEY,
}
_DEFAULT_NODE_FIELDS: Set[str] = {
    _keys.POSITIONS_KEY,
    _keys.NODE_FEATURES_KEY,
    _keys.NODE_ATTRS_KEY,
    _keys.ATOMIC_NUMBERS_KEY,
    _keys.ATOM_TYPE_KEY,
    _keys.PER_ATOM_ENERGY_KEY,
    _keys.PER_ATOM_STRESS_KEY,
    _keys.CHARGE_KEY,
    _keys.MAGMOM_KEY,
    _keys.FORCE_KEY,
    _keys.PARTIAL_FORCE_KEY,
    _keys.BORN_CHARGE_KEY,
    _keys.BATCH_KEY,
    _keys.FEATURE_NORM_FACTOR_KEY,
    _keys.NODE_MASK_KEY,
}
_DEFAULT_EDGE_FIELDS: Set[str] = {
    _keys.EDGE_CELL_SHIFT_KEY,
    _keys.EDGE_VECTORS_KEY,
    _keys.EDGE_LENGTH_KEY,
    _keys.NORM_LENGTH_KEY,
    _keys.EDGE_ATTRS_KEY,
    _keys.EDGE_EMBEDDING_KEY,
    _keys.EDGE_FEATURES_KEY,
    _keys.EDGE_CUTOFF_KEY,
    _keys.EDGE_ENERGY_KEY,
    _keys.EDGE_FORCE_KEY,
    _keys.EDGE_MASK_KEY,
}
_DEFAULT_CARTESIAN_TENSOR_FIELDS: Dict[str, str] = {
    _keys.STRESS_KEY: "ij=ji",
    _keys.VIRIAL_KEY: "ij=ji",
    _keys.BORN_CHARGE_KEY: "ij",
    _keys.DIELECTRIC_KEY: "ij=ji",
}

_GRAPH_FIELDS: Set[str] = set(_DEFAULT_GRAPH_FIELDS)
_NODE_FIELDS: Set[str] = set(_DEFAULT_NODE_FIELDS)
_EDGE_FIELDS: Set[str] = set(_DEFAULT_EDGE_FIELDS)
_LONG_FIELDS: Set[str] = set(_DEFAULT_LONG_FIELDS)
_CARTESIAN_TENSOR_FIELDS: Dict[str, str] = dict(_DEFAULT_CARTESIAN_TENSOR_FIELDS)


def register_fields(
    graph_fields: Sequence[str] = [],
    node_fields: Sequence[str] = [],
    edge_fields: Sequence[str] = [],
    long_fields: Sequence[str] = [],
    cartesian_tensor_fields: Dict[str, str] = {},
) -> None:
    """Register new fields as graph/node/edge/long/cartesian."""
    graph_fields, node_fields, edge_fields, long_fields = (
        set(graph_fields),
        set(node_fields),
        set(edge_fields),
        set(long_fields),
    )
    allowed = [graph_fields, node_fields, edge_fields]
    assert len(set.union(*allowed)) == sum(len(s) for s in allowed), (
        "fields cannot be in more than one category"
    )
    for f in graph_fields:
        assert f not in _NODE_FIELDS and f not in _EDGE_FIELDS, f
    for f in node_fields:
        assert f not in _GRAPH_FIELDS and f not in _EDGE_FIELDS, f
    for f in edge_fields:
        assert f not in _GRAPH_FIELDS and f not in _NODE_FIELDS, f
    _GRAPH_FIELDS.update(graph_fields)
    _NODE_FIELDS.update(node_fields)
    _EDGE_FIELDS.update(edge_fields)
    _LONG_FIELDS.update(long_fields)
    for k, fmt in cartesian_tensor_fields.items():
        _CARTESIAN_TENSOR_FIELDS[k] = fmt


def deregister_fields(*fields: str) -> None:
    for f in fields:
        assert f not in _DEFAULT_GRAPH_FIELDS, f"cannot deregister built-in field {f}"
        assert f not in _DEFAULT_NODE_FIELDS, f"cannot deregister built-in field {f}"
        assert f not in _DEFAULT_EDGE_FIELDS, f"cannot deregister built-in field {f}"
        _GRAPH_FIELDS.discard(f)
        _NODE_FIELDS.discard(f)
        _EDGE_FIELDS.discard(f)
        _LONG_FIELDS.discard(f)
        _CARTESIAN_TENSOR_FIELDS.pop(f, None)


def _register_field_prefix(prefix: str) -> None:
    """Re-register all registered fields with a name prefix (e.g. ``original_dataset_``)."""
    assert prefix.endswith("_")
    register_fields(
        graph_fields=[prefix + f for f in _GRAPH_FIELDS],
        node_fields=[prefix + f for f in _NODE_FIELDS],
        edge_fields=[prefix + f for f in _EDGE_FIELDS],
        long_fields=[prefix + f for f in _LONG_FIELDS],
        cartesian_tensor_fields={
            prefix + f: fmt for f, fmt in _CARTESIAN_TENSOR_FIELDS.items()
        },
    )


def get_field_type(field: str, error_on_unregistered: bool = True) -> str:
    if field in _GRAPH_FIELDS:
        return "graph"
    if field in _NODE_FIELDS:
        return "node"
    if field in _EDGE_FIELDS:
        return "edge"
    if error_on_unregistered:
        raise KeyError(f"field {field!r} is not registered")
    return "other"


ABBREV: Dict[str, str] = {
    _keys.TOTAL_ENERGY_KEY: "E",
    _keys.PER_ATOM_ENERGY_KEY: "Ei",
    _keys.FORCE_KEY: "F",
    _keys.STRESS_KEY: "stress",
    _keys.VIRIAL_KEY: "virial",
}
