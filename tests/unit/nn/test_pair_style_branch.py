"""Edge-force branch gate: pair-style (edge-vector input) forces must be
consistent with the position-branch autodiff forces.

Parity: the LAMMPS-MLIAP edge-force pathway
(/root/reference/nequip/nn/grad_output.py:276-298 and
lmp_mliap_wrapper.py:222-257).
"""

import numpy as np
import jax
import pytest

from nequip_tpu.data import _keys, from_dict, compute_neighborlist_, batched_from_list, pad_batch, to_device
from nequip_tpu.integrations import NequIPPairStyleWrapper
from nequip_tpu.model import NequIPGNNModel


def test_edge_forces_match_position_forces():
    model = NequIPGNNModel(
        seed=11, model_dtype="float64", type_names=["Cu"], r_max=4.0,
        num_layers=2, l_max=1, parity=False, num_features=4,
        radial_mlp_width=8, avg_num_neighbors=10.0,
        per_type_energy_shifts={"Cu": -0.4},
    )
    params = model.init_params()

    r = np.random.RandomState(0)
    n = 12
    pos = r.uniform(0, 6, (n, 3))
    frame = from_dict({_keys.POSITIONS_KEY: pos, _keys.ATOM_TYPE_KEY: np.zeros(n, int)})
    frame = compute_neighborlist_(frame, 4.0)
    ei = frame[_keys.EDGE_INDEX_KEY]
    data = to_device(pad_batch(batched_from_list([frame]), 128, 1024, 2))
    out = jax.jit(lambda p, d: model(p, d))(params, data)
    f_pos = np.asarray(out[_keys.FORCE_KEY])[:n]
    e_pos = float(out[_keys.TOTAL_ENERGY_KEY][0, 0])

    # pair-style branch: feed edge vectors directly
    wrapper = NequIPPairStyleWrapper(model, params)
    rij = pos[ei[1]] - pos[ei[0]]
    res = wrapper.compute(rij, ei[0], ei[1], np.zeros(n, int), n_local=n)
    np.testing.assert_allclose(res["total_energy"], e_pos, rtol=1e-10)

    # reconstruct atom forces from edge forces:
    # F_i = sum_{e: dst=i} ef_e - sum_{e: src=i} ef_e
    f_rec = np.zeros((n, 3))
    np.add.at(f_rec, ei[0], res["edge_forces"])
    np.subtract.at(f_rec, ei[1], res["edge_forces"])
    np.testing.assert_allclose(f_rec, f_pos, atol=1e-10)


def test_engine_spatial_decomposition_workload():
    """Emulate a LAMMPS-style MD engine: 2 spatial domains with ghost atoms
    (comm cutoff = num_layers * r_max), per-domain pair-style calls, engine
    force accumulation + reverse ghost communication.  Per-domain local
    energies must sum to the full periodic energy and the accumulated forces
    must match the full-cell position-gradient forces.

    Parity target: the reference's MLIAP wrapper contract
    (``lmp_mliap_wrapper.py:202-257``) incl. local-energy truncation.
    """
    import itertools

    import jax

    from nequip_tpu.integrations.pair_style import NequIPPairStyleWrapper
    from nequip_tpu.data import (
        batched_from_list,
        compute_neighborlist_,
        from_dict,
        pad_batch,
        to_device,
    )
    from nequip_tpu.model import NequIPGNNModel

    r_max = 3.0
    n_layers = 2
    a = 3.61
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a
    pos = np.concatenate(
        [base + np.array([i, j, k]) * a for i in range(4) for j in range(2) for k in range(2)]
    )
    rng = np.random.RandomState(4)
    pos = pos + rng.normal(0, 0.05, pos.shape)
    cell = np.diag([4 * a, 2 * a, 2 * a])
    n = len(pos)

    model = NequIPGNNModel(
        seed=2,
        model_dtype="float64",
        type_names=["Cu"],
        r_max=r_max,
        num_layers=n_layers,
        l_max=1,
        parity=False,
        num_features=4,
        radial_mlp_width=8,
        avg_num_neighbors=10.0,
        per_type_energy_shifts={"Cu": -2.0},
    )
    params = model.init_params()

    # --- full periodic reference (positions branch) -----------------------
    frame = from_dict(
        {
            _keys.POSITIONS_KEY: pos,
            _keys.CELL_KEY: cell,
            _keys.PBC_KEY: np.array([True] * 3),
            _keys.ATOM_TYPE_KEY: np.zeros(n, dtype=int),
        }
    )
    frame = compute_neighborlist_(frame, r_max)
    data = to_device(pad_batch(batched_from_list([frame]), 128, 4096, 2))
    out = jax.jit(lambda p, d: model(p, d))(params, data)
    e_full = float(out[_keys.TOTAL_ENERGY_KEY][0, 0])
    f_full = np.asarray(out[_keys.FORCE_KEY])[:n]

    # --- engine emulation: 2 x-slabs, ghosts out to n_layers * r_max ------
    wrapper = NequIPPairStyleWrapper(model, params, pad_multiple=64)
    comm_cut = n_layers * r_max
    inv = np.linalg.inv(cell)
    frac_x = (pos @ inv)[:, 0] % 1.0
    domain_of = (frac_x >= 0.5).astype(int)

    shifts = np.array(list(itertools.product([-1, 0, 1], repeat=3)), dtype=float)
    e_sum = 0.0
    f_acc = np.zeros((n, 3))
    for d in (0, 1):
        local_idx = np.nonzero(domain_of == d)[0]
        local_pos = pos[local_idx]
        # ghost candidates: every (atom, image) within comm_cut of any local
        nodes_pos = [local_pos]
        owners = [local_idx]
        for s in shifts:
            img = pos + s @ cell
            dmin = np.min(
                np.linalg.norm(img[:, None, :] - local_pos[None, :, :], axis=-1),
                axis=1,
            )
            is_local_entry = (np.abs(s).sum() == 0) & (domain_of == d)
            keep = (dmin < comm_cut + 1e-9) & ~is_local_entry
            nodes_pos.append(img[keep])
            owners.append(np.nonzero(keep)[0])
        nodes_pos = np.concatenate(nodes_pos)
        owners = np.concatenate(owners)
        n_local = len(local_idx)
        n_total = len(nodes_pos)

        # full per-rank NL: every directed pair within r_max (any dst)
        diff = nodes_pos[None, :, :] - nodes_pos[:, None, :]  # [dst, src]
        dist = np.linalg.norm(diff, axis=-1)
        dst, src = np.nonzero((dist < r_max) & (dist > 1e-9))
        rij = diff[dst, src]

        res = wrapper.compute(
            rij=rij,
            pair_i=dst,
            pair_j=src,
            elems=np.zeros(n_total, dtype=int),
            n_local=n_local,
        )
        e_sum += res["total_energy"]

        # engine force accumulation: F_i += g_e (center), F_j -= g_e (nbr),
        # then reverse-communicate ghost rows to their owner atoms
        f_nodes = np.zeros((n_total, 3))
        np.add.at(f_nodes, dst, res["edge_forces"])
        np.subtract.at(f_nodes, src, res["edge_forces"])
        np.add.at(f_acc, owners, f_nodes)

    np.testing.assert_allclose(e_sum, e_full, rtol=1e-9)
    np.testing.assert_allclose(f_acc, f_full, atol=1e-9)
