"""Per-edge-type cutoff gate: interactions beyond the pair-specific cutoff
must contribute nothing, even when within the global r_max.

Parity: ``EdgeLengthNormalizer`` per-edge-type path
(``/root/reference/nequip/nn/embedding/_edge.py:18-80``).
"""

import numpy as np
import jax
import pytest

from nequip_tpu.data import (
    _keys,
    batched_from_list,
    compute_neighborlist_,
    from_dict,
    pad_batch,
    to_device,
)
from nequip_tpu.model import NequIPGNNModel


@pytest.fixture(scope="module")
def model_and_fwd():
    model = NequIPGNNModel(
        seed=21,
        model_dtype="float64",
        type_names=["A", "B"],
        r_max=4.0,
        per_edge_type_cutoff={"A": {"A": 4.0, "B": 2.0}, "B": {"A": 2.0, "B": 2.0}},
        num_layers=1,
        l_max=1,
        parity=False,
        num_features=4,
        radial_mlp_width=8,
        avg_num_neighbors=4.0,
        per_type_energy_shifts={"A": -1.0, "B": -2.0},
    )
    params = model.init_params()
    return model, params, jax.jit(lambda p, d: model(p, d))


def eval_energy(fwd, params, pos, types):
    f = from_dict(
        {
            _keys.POSITIONS_KEY: np.asarray(pos, dtype=float),
            _keys.ATOM_TYPE_KEY: np.asarray(types),
            _keys.ATOMIC_NUMBERS_KEY: np.full(len(types), 29),
        }
    )
    f = compute_neighborlist_(f, 4.0)
    data = to_device(pad_batch(batched_from_list([f]), 64, 256, 2))
    return float(fwd(params, data)[_keys.TOTAL_ENERGY_KEY][0, 0])


def test_beyond_pair_cutoff_is_inert(model_and_fwd):
    """An A-B pair at 3 A (inside r_max=4, outside the 2 A A-B cutoff) must
    behave exactly like an isolated pair."""
    _, params, fwd = model_and_fwd
    e_pair = eval_energy(fwd, params, [[0, 0, 0], [3.0, 0, 0]], [0, 1])
    e_far = eval_energy(fwd, params, [[0, 0, 0], [50.0, 0, 0]], [0, 1])
    np.testing.assert_allclose(e_pair, e_far, atol=1e-12)


def test_within_pair_cutoff_interacts(model_and_fwd):
    _, params, fwd = model_and_fwd
    e_close = eval_energy(fwd, params, [[0, 0, 0], [1.5, 0, 0]], [0, 1])
    e_far = eval_energy(fwd, params, [[0, 0, 0], [50.0, 0, 0]], [0, 1])
    assert abs(e_close - e_far) > 1e-8


def test_aa_pair_uses_full_cutoff(model_and_fwd):
    """A-A keeps the 4 A cutoff: a 3 A A-A pair DOES interact."""
    _, params, fwd = model_and_fwd
    e_pair = eval_energy(fwd, params, [[0, 0, 0], [3.0, 0, 0]], [0, 0])
    e_far = eval_energy(fwd, params, [[0, 0, 0], [50.0, 0, 0]], [0, 0])
    assert abs(e_pair - e_far) > 1e-10
