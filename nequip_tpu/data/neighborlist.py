"""Host-side neighborlist construction.

TPU-native replacement for the reference's pluggable native NL backends
(matscipy C++ / vesin Rust / CUDA cell lists, ``/root/reference/nequip/data/_nl.py``).
Neighborlist building is pure data preparation that runs on the host during
data loading, so we implement one fast vectorized backend:

* **kdtree**: replicate source atoms into the periodic images reachable
  within the cutoff (computed from the cell's plane spacings, so arbitrary
  triclinic cells are handled), then query a scipy cKDTree (C implementation)
  between centers and images.  O(N log N), handles 100k+ atom systems.

A registry mirrors the reference's ``register_neighborlist_backend``
(``_nl.py:326``) so alternative backends can be plugged in.

Returned convention matches the reference: ``edge_index[0]`` = center (dst),
``edge_index[1]`` = neighbor (src), ``edge_cell_shift`` integer shifts such
that  ``vec = pos[src] - pos[dst] + shift @ cell``.  Full (directed) list;
self-edges via periodic images are kept, the trivial self-edge is excluded.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np

_NL_BACKENDS: Dict[str, Callable] = {}


def register_neighborlist_backend(name: str, fn: Callable) -> None:
    _NL_BACKENDS[name] = fn


def neighbor_list(
    pos: np.ndarray,
    r_max: float,
    cell: Optional[np.ndarray] = None,
    pbc=(False, False, False),
    backend: str = "auto",
) -> Tuple[np.ndarray, np.ndarray]:
    """Compute (edge_index (2, E) int, edge_cell_shift (E, 3) float).

    backend="auto" prefers the native C++ cell list (built on first use) and
    falls back to the scipy kdtree backend.
    """
    if backend == "auto":
        from ._cpp_nl import get_lib

        backend = "cpp" if get_lib() is not None else "kdtree"
    fn = _NL_BACKENDS[backend]
    return fn(pos=np.asarray(pos, dtype=np.float64), r_max=float(r_max), cell=cell, pbc=pbc)


def _kdtree_nl(
    pos: np.ndarray,
    r_max: float,
    cell: Optional[np.ndarray],
    pbc,
) -> Tuple[np.ndarray, np.ndarray]:
    from scipy.spatial import cKDTree

    n = pos.shape[0]
    pbc = np.asarray(pbc, dtype=bool).reshape(-1)
    if pbc.size == 1:
        pbc = np.repeat(pbc, 3)

    if cell is None or not pbc.any():
        tree = cKDTree(pos)
        pairs = tree.query_pairs(r_max, output_type="ndarray")  # (n_pairs, 2), i<j
        if pairs.size == 0:
            return np.zeros((2, 0), dtype=np.int32), np.zeros((0, 3))
        dst = np.concatenate([pairs[:, 0], pairs[:, 1]])
        src = np.concatenate([pairs[:, 1], pairs[:, 0]])
        edge_index = np.stack([dst, src]).astype(np.int32)
        return edge_index, np.zeros((edge_index.shape[1], 3))

    cell = np.asarray(cell, dtype=np.float64).reshape(3, 3)
    # number of periodic images needed per axis: spacing between lattice
    # planes h_i = 1 / ||row_i of inv(cell)^T|| = 1 / ||column_i of inv(cell)||
    inv = np.linalg.inv(cell)
    heights = 1.0 / np.linalg.norm(inv, axis=0)  # (3,)
    n_rep = np.where(pbc, np.ceil(r_max / heights).astype(int), 0)

    # Wrap positions into the cell along periodic axes so that unwrapped
    # trajectories (e.g. long MD runs where atoms diffuse across many box
    # lengths) still see all neighbors within n_rep images.  The per-atom
    # integer wrap vectors are folded back into the returned shifts so the
    # contract  vec = pos[src] - pos[dst] + shift @ cell  holds for the
    # ORIGINAL (unwrapped) positions — same bookkeeping as ops/device_nl.py.
    frac = pos @ inv
    wrap = np.where(pbc, np.floor(frac), 0.0)  # (n, 3) integer-valued
    pos = (frac - wrap) @ cell

    shifts = np.array(
        [
            (i, j, k)
            for i in range(-n_rep[0], n_rep[0] + 1)
            for j in range(-n_rep[1], n_rep[1] + 1)
            for k in range(-n_rep[2], n_rep[2] + 1)
        ],
        dtype=np.float64,
    )
    # all source images: (n_shifts, n, 3)
    images = pos[None, :, :] + (shifts @ cell)[:, None, :]
    flat = images.reshape(-1, 3)

    tree = cKDTree(flat)
    neigh = tree.query_ball_point(pos, r_max)

    dst_list, src_list, shift_list = [], [], []
    n_shift = shifts.shape[0]
    for i, nbrs in enumerate(neigh):
        nbrs = np.asarray(nbrs, dtype=np.int64)
        if nbrs.size == 0:
            continue
        s_idx, j_idx = np.divmod(nbrs, n)
        keep = ~((j_idx == i) & np.all(shifts[s_idx] == 0, axis=1))
        s_idx, j_idx = s_idx[keep], j_idx[keep]
        dst_list.append(np.full(j_idx.shape, i, dtype=np.int64))
        src_list.append(j_idx)
        # undo the wrapping: shift_unwrapped = shift_wrapped + wrap[dst] - wrap[src]
        shift_list.append(shifts[s_idx] + wrap[i] - wrap[j_idx])

    if not dst_list:
        return np.zeros((2, 0), dtype=np.int32), np.zeros((0, 3))
    edge_index = np.stack(
        [np.concatenate(dst_list), np.concatenate(src_list)]
    ).astype(np.int32)
    edge_cell_shift = np.concatenate(shift_list, axis=0)
    return edge_index, edge_cell_shift


register_neighborlist_backend("kdtree", _kdtree_nl)


def _cpp_nl(pos, r_max, cell, pbc):
    from ._cpp_nl import cpp_cell_list_nl

    return cpp_cell_list_nl(pos, r_max, cell, pbc)


register_neighborlist_backend("cpp", _cpp_nl)


def compute_neighborlist_(
    data: dict,
    r_max: float,
    backend: str = "auto",
) -> dict:
    """In-place NL construction on an AtomicDataDict-style host dict.

    Parity: ``compute_neighborlist_`` (``/root/reference/nequip/data/_nl.py:364``).
    """
    from . import _keys

    cell = data.get(_keys.CELL_KEY)
    if cell is not None:
        cell = np.asarray(cell).reshape(3, 3)
    pbc = data.get(_keys.PBC_KEY, np.zeros(3, dtype=bool))
    edge_index, shifts = neighbor_list(
        data[_keys.POSITIONS_KEY], r_max, cell=cell, pbc=np.asarray(pbc).reshape(-1), backend=backend
    )
    for k in [k for k in data if k.startswith(_keys.EDGE_LAYOUT_KEY_PREFIX)]:
        del data[k]  # derived fused-kernel layouts are stale once edges change
    data[_keys.EDGE_INDEX_KEY] = edge_index
    if cell is not None:
        data[_keys.EDGE_CELL_SHIFT_KEY] = shifts
    return data
