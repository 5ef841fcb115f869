"""AtomicDataDict: the single inter-module data structure.

Like the reference (``/root/reference/nequip/data/AtomicDataDict.py``), all
data flowing between modules is a flat ``dict[str, array]`` with registered
field types.  The TPU-native difference is the **static-shape padding
contract**:

* host-side, frames are plain numpy dicts (float64);
* ``batched_from_list`` concatenates frames into one graph batch;
* ``pad_batch`` pads nodes/edges/frames up to fixed capacities and adds
  boolean masks (``node_mask``/``edge_mask``/``frame_mask``).  Every jit
  signature is therefore static: one compilation per capacity bucket instead
  of the reference's dynamic-shape machinery
  (``/root/reference/nequip/nn/compile.py``, ``utils/fx.py``);
* padded edges point at the LAST node slot with zero shift and are masked
  (keeps dst-sorted edge order intact for the fused kernels); padded nodes
  belong to the last (padded) frame where possible so their (masked) zero
  contributions can never alias a real frame.

Shape conventions follow the reference exactly (``data/_keys.py`` there):
``pos (N, 3)``, ``edge_index (2, E)`` with row 0 = destination/center and
row 1 = source/neighbor, ``cell (F, 3, 3)`` with rows as cell vectors.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from . import _keys
from ._key_registry import (
    _CARTESIAN_TENSOR_FIELDS,
    _EDGE_FIELDS,
    _GRAPH_FIELDS,
    _LONG_FIELDS,
    _NODE_FIELDS,
    get_field_type,
)

Type = Dict[str, Any]

_INT_DTYPE = np.int32  # TPU-friendly index dtype


# ---------------------------------------------------------------------------
# ingestion / canonicalization  (behavior parity: /root/reference/nequip/data/dict.py)
# ---------------------------------------------------------------------------
def from_dict(data: Dict[str, Any]) -> Type:
    """Canonicalize a raw dict of arrays into AtomicDataDict conventions."""
    out: Type = {}
    for k, v in data.items():
        if v is None:
            continue
        arr = np.asarray(v)
        if k in _LONG_FIELDS:
            arr = arr.astype(_INT_DTYPE)
        elif arr.dtype.kind == "f":
            arr = arr.astype(np.float64)
        elif arr.dtype.kind == "b":
            arr = arr.astype(bool)
        out[k] = arr

    if _keys.POSITIONS_KEY in out:
        pos = out[_keys.POSITIONS_KEY]
        assert pos.ndim == 2 and pos.shape[1] == 3, f"pos shape {pos.shape}"
        n_atoms = pos.shape[0]
    else:
        n_atoms = None

    # cell: (3,3) -> (1,3,3)
    if _keys.CELL_KEY in out:
        cell = out[_keys.CELL_KEY]
        if cell.shape == (3, 3):
            cell = cell.reshape(1, 3, 3)
        assert cell.ndim == 3 and cell.shape[-2:] == (3, 3), cell.shape
        out[_keys.CELL_KEY] = cell
    if _keys.PBC_KEY in out:
        pbc = out[_keys.PBC_KEY]
        if pbc.ndim == 0:
            pbc = np.full((1, 3), bool(pbc))
        elif pbc.shape == (3,):
            pbc = pbc.reshape(1, 3)
        out[_keys.PBC_KEY] = pbc.astype(bool)

    # cartesian tensors: (3,3) -> (1,3,3)
    for k in _CARTESIAN_TENSOR_FIELDS:
        if k in out and get_field_type(k) == "graph":
            t = out[k]
            if t.shape[-2:] == (3, 3) and t.ndim == 2:
                out[k] = t.reshape(1, 3, 3)

    # rank promotions for per-atom / per-frame scalars
    for k in list(out.keys()):
        v = out[k]
        ftype = get_field_type(k, error_on_unregistered=False)
        if k in (_keys.ATOM_TYPE_KEY, _keys.ATOMIC_NUMBERS_KEY, _keys.BATCH_KEY):
            out[k] = v.reshape(-1)
        elif ftype == "node" and v.ndim == 1 and k != _keys.NODE_MASK_KEY:
            out[k] = v.reshape(-1, 1)
        elif ftype == "graph" and k not in (
            _keys.CELL_KEY,
            _keys.PBC_KEY,
            _keys.FRAME_MASK_KEY,
            _keys.NUM_NODES_KEY,
        ):
            if v.ndim == 0:
                out[k] = v.reshape(1, 1)
            elif v.ndim == 1 and k not in _CARTESIAN_TENSOR_FIELDS:
                out[k] = v.reshape(-1, 1) if k != _keys.DATASET_KEY else v.reshape(-1, 1)

    if _keys.EDGE_INDEX_KEY in out:
        ei = out[_keys.EDGE_INDEX_KEY]
        assert ei.ndim == 2 and ei.shape[0] == 2, ei.shape

    # per-frame atom count
    if n_atoms is not None and _keys.NUM_NODES_KEY not in out:
        if _keys.BATCH_KEY in out:
            nf = int(out[_keys.BATCH_KEY].max()) + 1 if out[_keys.BATCH_KEY].size else 1
            out[_keys.NUM_NODES_KEY] = np.bincount(
                out[_keys.BATCH_KEY], minlength=nf
            ).astype(_INT_DTYPE)
        else:
            out[_keys.NUM_NODES_KEY] = np.array([n_atoms], dtype=_INT_DTYPE)
    return out


# ---------------------------------------------------------------------------
# counts
# ---------------------------------------------------------------------------
def num_frames(data: Type) -> int:
    return int(data[_keys.NUM_NODES_KEY].shape[0])


def num_nodes(data: Type) -> int:
    return int(data[_keys.POSITIONS_KEY].shape[0])


def num_edges(data: Type) -> int:
    return int(data[_keys.EDGE_INDEX_KEY].shape[1])


def with_batch_(data: Type) -> Type:
    """Ensure batch/num_nodes fields exist (trivial single-frame batch)."""
    if _keys.BATCH_KEY in data:
        return data
    n = num_nodes(data)
    data[_keys.BATCH_KEY] = np.zeros(n, dtype=_INT_DTYPE)
    data.setdefault(_keys.NUM_NODES_KEY, np.array([n], dtype=_INT_DTYPE))
    return data


# ---------------------------------------------------------------------------
# batching  (parity: AtomicDataDict.batched_from_list, :71-140)
# ---------------------------------------------------------------------------
def batched_from_list(frames: Sequence[Type]) -> Type:
    """Concatenate single frames into one batched graph (host-side, no padding)."""
    frames = [dict(f) for f in frames]
    if len(frames) == 0:
        raise ValueError("cannot batch zero frames")
    keys = set(frames[0].keys())
    for f in frames[1:]:
        if set(f.keys()) != keys:
            raise KeyError(
                f"inconsistent keys across frames: {keys} vs {set(f.keys())}"
            )
    keys.discard(_keys.BATCH_KEY)
    keys.discard(_keys.NUM_NODES_KEY)

    out: Type = {}
    node_counts = [f[_keys.POSITIONS_KEY].shape[0] for f in frames]
    node_offsets = np.concatenate([[0], np.cumsum(node_counts)[:-1]])

    for k in keys:
        ftype = get_field_type(k, error_on_unregistered=False)
        if k == _keys.EDGE_INDEX_KEY:
            out[k] = np.concatenate(
                [f[k] + off for f, off in zip(frames, node_offsets)], axis=1
            ).astype(_INT_DTYPE)
        elif ftype in ("node", "edge"):
            out[k] = np.concatenate([f[k] for f in frames], axis=0)
        elif ftype == "graph":
            out[k] = np.concatenate([np.atleast_1d(f[k]) for f in frames], axis=0)
        else:
            # non-registered: keep per-frame list
            out[k] = [f[k] for f in frames]

    out[_keys.BATCH_KEY] = np.concatenate(
        [np.full(n, i, dtype=_INT_DTYPE) for i, n in enumerate(node_counts)]
    )
    out[_keys.NUM_NODES_KEY] = np.asarray(node_counts, dtype=_INT_DTYPE)
    return out


def frame_from_batched(data: Type, index: int) -> Type:
    """Extract a single frame from a batched (optionally padded) dict."""
    nf = num_frames(data)
    if index < 0:
        index += nf
    assert 0 <= index < nf
    batch = data[_keys.BATCH_KEY]
    node_sel = batch == index
    if _keys.NODE_MASK_KEY in data:
        node_sel = node_sel & data[_keys.NODE_MASK_KEY]
    node_idx = np.nonzero(np.asarray(node_sel))[0]

    out: Type = {}
    if _keys.EDGE_INDEX_KEY in data:
        ei = np.asarray(data[_keys.EDGE_INDEX_KEY])
        edge_sel = np.isin(ei[0], node_idx)
        if _keys.EDGE_MASK_KEY in data:
            edge_sel = edge_sel & np.asarray(data[_keys.EDGE_MASK_KEY])
        edge_idx = np.nonzero(edge_sel)[0]
        remap = np.full(num_nodes(data), -1, dtype=_INT_DTYPE)
        remap[node_idx] = np.arange(len(node_idx), dtype=_INT_DTYPE)
        out[_keys.EDGE_INDEX_KEY] = remap[ei[:, edge_idx]]
    else:
        edge_idx = None

    for k, v in data.items():
        if k in (
            _keys.EDGE_INDEX_KEY,
            _keys.BATCH_KEY,
            _keys.NUM_NODES_KEY,
            _keys.NODE_MASK_KEY,
            _keys.EDGE_MASK_KEY,
            _keys.FRAME_MASK_KEY,
        ) or k.startswith(_keys.EDGE_LAYOUT_KEY_PREFIX):
            continue
        ftype = get_field_type(k, error_on_unregistered=False)
        v = np.asarray(v)
        if ftype == "node":
            out[k] = v[node_idx]
        elif ftype == "edge":
            assert edge_idx is not None
            out[k] = v[edge_idx]
        elif ftype == "graph":
            out[k] = v[index : index + 1]
        else:
            out[k] = v
    out[_keys.NUM_NODES_KEY] = np.array([len(node_idx)], dtype=_INT_DTYPE)
    return out


def without_nodes(data: Type, which_nodes: np.ndarray) -> Type:
    """Return a copy of an (unpadded) frame/batch with the given nodes removed.

    Parity: ``AtomicDataDict.without_nodes`` (:188-239).
    """
    n = num_nodes(data)
    mask = np.ones(n, dtype=bool)
    mask[np.asarray(which_nodes)] = False
    keep_idx = np.nonzero(mask)[0]
    remap = np.full(n, -1, dtype=_INT_DTYPE)
    remap[keep_idx] = np.arange(len(keep_idx), dtype=_INT_DTYPE)

    out: Type = {}
    if _keys.EDGE_INDEX_KEY in data:
        ei = np.asarray(data[_keys.EDGE_INDEX_KEY])
        edge_keep = mask[ei[0]] & mask[ei[1]]
        out[_keys.EDGE_INDEX_KEY] = remap[ei[:, edge_keep]]
    for k, v in data.items():
        if k in (_keys.EDGE_INDEX_KEY, _keys.NUM_NODES_KEY) or k.startswith(
            _keys.EDGE_LAYOUT_KEY_PREFIX
        ):
            continue
        ftype = get_field_type(k, error_on_unregistered=False)
        v = np.asarray(v)
        if ftype == "node":
            out[k] = v[keep_idx]
        elif ftype == "edge":
            out[k] = v[edge_keep]
        else:
            out[k] = v
    if _keys.BATCH_KEY in out:
        nf = int(out[_keys.BATCH_KEY].max()) + 1 if len(out[_keys.BATCH_KEY]) else 1
        out[_keys.NUM_NODES_KEY] = np.bincount(
            out[_keys.BATCH_KEY], minlength=nf
        ).astype(_INT_DTYPE)
    else:
        out[_keys.NUM_NODES_KEY] = np.array([len(keep_idx)], dtype=_INT_DTYPE)
    return out


# ---------------------------------------------------------------------------
# padding (TPU static-shape contract)
# ---------------------------------------------------------------------------
def pad_batch(
    data: Type,
    n_nodes: int,
    n_edges: int,
    n_frames: Optional[int] = None,
) -> Type:
    """Pad a batched dict to static capacities and attach masks.

    Padded nodes are assigned to the last frame slot (a padded frame when one
    exists), padded edges to the last node slot with zero cell shift.  Float
    padding is zeros.  Real data is never truncated — capacities must be >=
    true sizes.
    """
    data = with_batch_(dict(data))
    N = num_nodes(data)
    E = num_edges(data) if _keys.EDGE_INDEX_KEY in data else 0
    F = num_frames(data)
    if n_frames is None:
        n_frames = F
    assert n_nodes >= N, f"node capacity {n_nodes} < {N}"
    assert n_edges >= E, f"edge capacity {n_edges} < {E}"
    assert n_frames >= F, f"frame capacity {n_frames} < {F}"

    out: Type = {}
    pad_frame_index = n_frames - 1 if n_frames > F else F - 1

    for k, v in data.items():
        v = np.asarray(v)
        if k == _keys.EDGE_INDEX_KEY:
            # padded edges point at the LAST node slot (a padded node when one
            # exists): keeps dst-sorted edge order intact for fused kernels,
            # and their (masked, zero) messages can never pollute row 0
            padded = np.full((2, n_edges), n_nodes - 1, dtype=_INT_DTYPE)
            padded[:, :E] = v
            out[k] = padded
            continue
        if k == _keys.BATCH_KEY:
            padded = np.full(n_nodes, pad_frame_index, dtype=_INT_DTYPE)
            padded[:N] = v
            out[k] = padded
            continue
        ftype = get_field_type(k, error_on_unregistered=False)
        if ftype == "node":
            pad_to = n_nodes
        elif ftype == "edge":
            pad_to = n_edges
        elif ftype == "graph":
            pad_to = n_frames
        else:
            out[k] = v
            continue
        cur = v.shape[0]
        if cur == pad_to:
            out[k] = v
        else:
            padded = np.zeros((pad_to,) + v.shape[1:], dtype=v.dtype)
            padded[:cur] = v
            out[k] = padded

    out[_keys.NODE_MASK_KEY] = np.arange(n_nodes) < N
    out[_keys.EDGE_MASK_KEY] = np.arange(n_edges) < E
    out[_keys.FRAME_MASK_KEY] = np.arange(n_frames) < F
    return out


def to_device(data: Type, dtype=None) -> Type:
    """Convert a host (numpy) dict to jax arrays with the model's float dtype."""
    import jax.numpy as jnp

    if dtype is None:
        from ..utils.global_state import global_dtype

        dtype = global_dtype()
    out: Type = {}
    for k, v in data.items():
        v = np.asarray(v)
        if v.dtype.kind == "f":
            out[k] = jnp.asarray(v, dtype=dtype)
        else:
            out[k] = jnp.asarray(v)
    return out


def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple
