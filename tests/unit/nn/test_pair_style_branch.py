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
