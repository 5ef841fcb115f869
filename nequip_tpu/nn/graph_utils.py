"""Edge-vector and edge-type helpers (device-side, differentiable).

Parity: ``with_edge_vectors_`` / ``with_edge_type_``
(``/root/reference/nequip/nn/utils.py:68-133``).  Differentiable w.r.t.
positions and cell so ``jax.grad`` of the energy yields forces and virials.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data import _keys


def with_edge_vectors(data: dict, with_lengths: bool = True) -> dict:
    """Compute ``edge_vectors`` (and optionally ``edge_lengths``).

    ``vec = pos[src] - pos[dst] + edge_cell_shift @ cell[batch[dst]]``.
    Padded edges (src = dst = node 0, zero shift) get zero vectors; lengths
    use a masked sqrt so gradients stay finite.
    """
    if _keys.EDGE_VECTORS_KEY not in data:
        pos = data[_keys.POSITIONS_KEY]
        edge_index = data[_keys.EDGE_INDEX_KEY]
        vec = jnp.take(pos, edge_index[1], axis=0) - jnp.take(pos, edge_index[0], axis=0)
        if _keys.CELL_KEY in data:
            cell = data[_keys.CELL_KEY]  # (F, 3, 3)
            shifts = data[_keys.EDGE_CELL_SHIFT_KEY]  # (E, 3)
            edge_batch = jnp.take(data[_keys.BATCH_KEY], edge_index[0], axis=0)
            edge_cell = jnp.take(cell, edge_batch, axis=0)  # (E, 3, 3)
            # full precision: the TPU default lowers f32 einsums to bf16 MXU
            # passes, which would corrupt PBC image offsets (~1e-1 A for a
            # 65 A box) and with them every force
            vec = vec + jnp.einsum(
                "ei,eij->ej",
                shifts.astype(vec.dtype),
                edge_cell,
                precision=jax.lax.Precision.HIGHEST,
            )
        data = dict(data)
        data[_keys.EDGE_VECTORS_KEY] = vec
    else:
        data = dict(data)
        vec = data[_keys.EDGE_VECTORS_KEY]
    if with_lengths and _keys.EDGE_LENGTH_KEY not in data:
        n2 = jnp.sum(vec * vec, axis=-1, keepdims=True)
        # double-where: finite gradient for padded zero-length edges
        safe = jnp.where(n2 > 0, n2, 1.0)
        data[_keys.EDGE_LENGTH_KEY] = jnp.where(n2 > 0, jnp.sqrt(safe), 0.0)
    return data


def with_edge_types(data: dict) -> dict:
    if _keys.EDGE_TYPE_KEY not in data:
        data = dict(data)
        types = data[_keys.ATOM_TYPE_KEY].reshape(-1)
        ei = data[_keys.EDGE_INDEX_KEY]
        data[_keys.EDGE_TYPE_KEY] = jnp.stack(
            [jnp.take(types, ei[0]), jnp.take(types, ei[1])]
        )
    return data
