"""Spatial-decomposition gates: sharded-graph evaluation over an 8-device
mesh must match single-device results to machine precision (the analog of
the reference's ghost-exchange correctness contract, SURVEY §2.9)."""

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
from nequip_tpu.data.dataset import LJTestDataset
from nequip_tpu.model import NequIPGNNModel
from nequip_tpu.parallel import make_mesh
from nequip_tpu.parallel.ghost import ShardedGraphEvaluator, spatial_partition


@pytest.fixture(scope="module")
def setup():
    model = NequIPGNNModel(
        seed=0,
        model_dtype="float64",
        type_names=["Cu"],
        r_max=4.0,
        num_layers=2,
        l_max=1,
        parity=False,
        num_features=4,
        radial_mlp_width=8,
        avg_num_neighbors=18.0,
        per_type_energy_shifts={"Cu": -0.4},
    )
    params = model.init_params()
    ds = LJTestDataset(supercell=(4, 2, 2), num_frames=1, seed=12)
    frame = from_dict(
        {
            _keys.POSITIONS_KEY: ds.frames[0][_keys.POSITIONS_KEY],
            _keys.CELL_KEY: ds.frames[0][_keys.CELL_KEY],
            _keys.PBC_KEY: np.array([True] * 3),
            _keys.ATOM_TYPE_KEY: np.zeros(64, dtype=int),
        }
    )
    return model, params, frame


def test_partition_covers_all_atoms(setup):
    _, _, frame = setup
    parts = spatial_partition(frame, 8, 4.0)
    total_local = int(parts["local_mask"].sum())
    assert total_local == 64
    # every edge lands on exactly one device
    assert int(parts["edge_mask"].sum()) == frame[_keys.EDGE_INDEX_KEY].shape[1] if _keys.EDGE_INDEX_KEY in frame else True


def test_sharded_matches_single_device(setup):
    model, params, frame = setup
    ref_frame = compute_neighborlist_(dict(frame), 4.0)
    data = to_device(pad_batch(batched_from_list([ref_frame]), 128, 4096, 2))
    out = jax.jit(lambda p, d: model(p, d))(params, data)
    e_ref = float(out[_keys.TOTAL_ENERGY_KEY][0, 0])
    f_ref = np.asarray(out[_keys.FORCE_KEY])[:64]

    mesh = make_mesh((8,), ("graph",))
    ev = ShardedGraphEvaluator(model, params, mesh=mesh, axis_name="graph")
    e_sh, f_sh = ev.evaluate(frame)

    np.testing.assert_allclose(e_sh, e_ref, rtol=1e-12)
    np.testing.assert_allclose(f_sh, f_ref, atol=1e-12)
