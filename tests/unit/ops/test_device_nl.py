"""On-device cell-list neighborlist vs the host backend (exact edge-set)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nequip_tpu.data.neighborlist import neighbor_list
from nequip_tpu.ops.device_nl import device_neighbor_list, suggest_grid_dims


def _edge_set(edge_index, shifts, mask=None):
    ei = np.asarray(edge_index)
    sh = np.asarray(np.rint(shifts)).astype(int)
    E = ei.shape[1]
    keep = np.ones(E, bool) if mask is None else np.asarray(mask)
    return {
        (int(ei[0, k]), int(ei[1, k]), sh[k, 0], sh[k, 1], sh[k, 2])
        for k in range(E)
        if keep[k]
    }


def _bulk(n_rep, jitter_seed, displace=None):
    r = np.random.RandomState(jitter_seed)
    a = 3.61
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a
    pos = np.concatenate(
        [
            base + np.array([i, j, k]) * a
            for i in range(n_rep)
            for j in range(n_rep)
            for k in range(n_rep)
        ]
    )
    pos = pos + r.normal(0, 0.08, pos.shape)
    cell = np.diag([n_rep * a] * 3)
    if displace is not None:
        pos = pos + displace
    return pos, cell


@pytest.mark.parametrize("displace", [None, "outside"])
def test_device_nl_matches_host(displace):
    r_max = 3.0
    pos, cell = _bulk(4, 0)  # 256 atoms, 14.44 A box -> 4x4x4 grid
    if displace == "outside":
        # raw positions far outside the cell: wrap bookkeeping must cancel
        pos = pos + np.array([2.0, -1.0, 3.0]) @ cell

    ei_ref, sh_ref = neighbor_list(pos, r_max, cell=cell, pbc=(True,) * 3)
    ref = _edge_set(ei_ref, sh_ref)

    dims = suggest_grid_dims(cell, r_max)
    ei, sh, mask, overflow = device_neighbor_list(
        jnp.asarray(pos), jnp.asarray(cell), r_max, dims, cell_cap=16, k_max=48
    )
    assert not bool(overflow)
    got = _edge_set(ei, sh, mask)
    assert got == ref
    # dst-major ordering (the fused-kernel contract)
    dst = np.asarray(ei)[0][np.asarray(mask)]
    assert np.all(np.diff(dst) >= 0)


def test_device_nl_overflow_flag():
    pos, cell = _bulk(4, 1)
    dims = suggest_grid_dims(cell, 3.0)
    # absurdly small k_max must raise the overflow flag, not silently truncate
    *_, overflow = device_neighbor_list(
        jnp.asarray(pos), jnp.asarray(cell), 3.0, dims, cell_cap=16, k_max=2
    )
    assert bool(overflow)
    # tiny bucket capacity likewise
    *_, overflow2 = device_neighbor_list(
        jnp.asarray(pos), jnp.asarray(cell), 3.0, dims, cell_cap=1, k_max=48
    )
    assert bool(overflow2)


def test_device_nl_thin_box_rejected():
    pos, cell = _bulk(4, 2)
    with pytest.raises(AssertionError):
        suggest_grid_dims(cell, 6.0)  # box only ~2.4 cells thick
