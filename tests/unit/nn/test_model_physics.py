"""Physics-property gates for the full model.

Ports of the reference's model test suite
(``/root/reference/nequip/utils/unittests/model_tests_basic.py:308-959``):
batched-vs-single consistency, O(3)+permutation equivariance, numeric-vs-
autograd forces, isolated-atom energies, per-type scale/shift, padding
invariance (the TPU-specific contract).
"""

import numpy as np
import jax
import jax.numpy as jnp
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
from nequip_tpu.data.transforms import ChemicalSpeciesToAtomTypeMapper
from nequip_tpu.model import NequIPGNNModel
from nequip_tpu.ops import random_rotation

R_MAX = 4.0
SHIFTS = {"Cu": -3.5, "H": -1.25}
SCALES = {"Cu": 0.5, "H": 0.25}


@pytest.fixture(scope="module")
def model_and_params():
    model = NequIPGNNModel(
        seed=7,
        model_dtype="float64",
        type_names=["Cu", "H"],
        r_max=R_MAX,
        num_layers=2,
        l_max=1,
        parity=True,
        num_features=8,
        avg_num_neighbors=10.0,
        per_type_energy_shifts=SHIFTS,
        per_type_energy_scales=SCALES,
    )
    params = model.init_params()
    fwd = jax.jit(lambda p, d: model(p, d))
    return model, params, fwd


def make_frame(seed=0, n_extra_h=2):
    ds = LJTestDataset(supercell=(1, 1, 1), num_frames=1, seed=seed)
    frame = dict(ds.frames[0])
    r = np.random.RandomState(seed + 100)
    # mix in a second species
    pos = frame[_keys.POSITIONS_KEY]
    extra = r.uniform(0.8, 2.8, (n_extra_h, 3))
    frame[_keys.POSITIONS_KEY] = np.concatenate([pos, extra])
    frame[_keys.ATOMIC_NUMBERS_KEY] = np.concatenate(
        [frame[_keys.ATOMIC_NUMBERS_KEY], np.ones(n_extra_h, dtype=int)]
    )
    for k in (_keys.FORCE_KEY, _keys.TOTAL_ENERGY_KEY, _keys.STRESS_KEY, _keys.VIRIAL_KEY):
        frame.pop(k, None)
    data = from_dict(frame)
    data = ChemicalSpeciesToAtomTypeMapper(["Cu", "H"])(data)
    return compute_neighborlist_(data, R_MAX)


def padded(frames, n_nodes=48, n_edges=1024, n_frames=3):
    batch = batched_from_list(frames)
    return to_device(pad_batch(batch, n_nodes, n_edges, n_frames))


def test_padding_invariance(model_and_params):
    """Outputs must be independent of the padding capacities."""
    model, params, fwd = model_and_params
    frame = make_frame(0)
    out1 = fwd(params, padded([frame]))
    out2 = fwd(params, padded([frame], n_nodes=64, n_edges=1280, n_frames=4))
    np.testing.assert_allclose(
        np.asarray(out1[_keys.TOTAL_ENERGY_KEY][0]),
        np.asarray(out2[_keys.TOTAL_ENERGY_KEY][0]),
        atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(out1[_keys.FORCE_KEY][:6]),
        np.asarray(out2[_keys.FORCE_KEY][:6]),
        atol=1e-10,
    )


def test_batched_vs_single(model_and_params):
    """Parity: ``test_batch`` — batching frames must not change outputs."""
    model, params, fwd = model_and_params
    f1, f2 = make_frame(1), make_frame(2)
    out_b = fwd(params, padded([f1, f2]))
    out_1 = fwd(params, padded([f1]))
    out_2 = fwd(params, padded([f2]))
    np.testing.assert_allclose(
        np.asarray(out_b[_keys.TOTAL_ENERGY_KEY][:2]).reshape(-1),
        [
            float(out_1[_keys.TOTAL_ENERGY_KEY][0, 0]),
            float(out_2[_keys.TOTAL_ENERGY_KEY][0, 0]),
        ],
        atol=1e-10,
    )
    n1 = f1[_keys.POSITIONS_KEY].shape[0]
    np.testing.assert_allclose(
        np.asarray(out_b[_keys.FORCE_KEY][:n1]),
        np.asarray(out_1[_keys.FORCE_KEY][:n1]),
        atol=1e-10,
    )
    # cross-frame gradient isolation: stress of frame 2 identical alone/batched
    np.testing.assert_allclose(
        np.asarray(out_b[_keys.STRESS_KEY][1]),
        np.asarray(out_2[_keys.STRESS_KEY][0]),
        atol=1e-10,
    )


def test_rotation_equivariance(model_and_params):
    """Energy invariant; forces rotate as vectors; stress as a rank-2 tensor."""
    model, params, fwd = model_and_params
    frame = make_frame(3)
    R = random_rotation(np.random.RandomState(5))

    out = fwd(params, padded([frame]))

    frame_rot = dict(frame)
    frame_rot[_keys.POSITIONS_KEY] = frame[_keys.POSITIONS_KEY] @ R.T
    frame_rot[_keys.CELL_KEY] = frame[_keys.CELL_KEY] @ R.T
    out_rot = fwd(params, padded([frame_rot]))

    np.testing.assert_allclose(
        float(out_rot[_keys.TOTAL_ENERGY_KEY][0, 0]),
        float(out[_keys.TOTAL_ENERGY_KEY][0, 0]),
        atol=1e-8,
    )
    n = frame[_keys.POSITIONS_KEY].shape[0]
    np.testing.assert_allclose(
        np.asarray(out_rot[_keys.FORCE_KEY][:n]),
        np.asarray(out[_keys.FORCE_KEY][:n]) @ R.T,
        atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(out_rot[_keys.STRESS_KEY][0]),
        R @ np.asarray(out[_keys.STRESS_KEY][0]) @ R.T,
        atol=1e-8,
    )


def test_permutation_equivariance(model_and_params):
    model, params, fwd = model_and_params
    frame = make_frame(4)
    n = frame[_keys.POSITIONS_KEY].shape[0]
    perm = np.random.RandomState(6).permutation(n)

    out = fwd(params, padded([frame]))

    frame_p = dict(frame)
    inv = np.empty(n, dtype=np.int32)
    inv[perm] = np.arange(n, dtype=np.int32)
    frame_p[_keys.POSITIONS_KEY] = frame[_keys.POSITIONS_KEY][perm]
    frame_p[_keys.ATOMIC_NUMBERS_KEY] = frame[_keys.ATOMIC_NUMBERS_KEY][perm]
    frame_p[_keys.ATOM_TYPE_KEY] = frame[_keys.ATOM_TYPE_KEY][perm]
    frame_p[_keys.EDGE_INDEX_KEY] = inv[frame[_keys.EDGE_INDEX_KEY]]
    out_p = fwd(params, padded([frame_p]))

    np.testing.assert_allclose(
        float(out_p[_keys.TOTAL_ENERGY_KEY][0, 0]),
        float(out[_keys.TOTAL_ENERGY_KEY][0, 0]),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(out_p[_keys.FORCE_KEY][:n]),
        np.asarray(out[_keys.FORCE_KEY])[perm],
        atol=1e-9,
    )


def test_numeric_gradient(model_and_params):
    """Parity: ``test_numeric_gradient`` — autograd forces match central
    differences of the energy."""
    model, params, fwd = model_and_params
    frame = make_frame(5)
    data = padded([frame])
    forces = np.asarray(fwd(params, data)[_keys.FORCE_KEY])

    h = 1e-5
    for atom, axis in [(0, 0), (2, 1), (5, 2)]:
        dp = np.asarray(data[_keys.POSITIONS_KEY])
        dplus = dict(data)
        pp = dp.copy()
        pp[atom, axis] += h
        dplus[_keys.POSITIONS_KEY] = jnp.asarray(pp)
        dminus = dict(data)
        pm = dp.copy()
        pm[atom, axis] -= h
        dminus[_keys.POSITIONS_KEY] = jnp.asarray(pm)
        ep = float(fwd(params, dplus)[_keys.TOTAL_ENERGY_KEY][0, 0])
        em = float(fwd(params, dminus)[_keys.TOTAL_ENERGY_KEY][0, 0])
        np.testing.assert_allclose(
            forces[atom, axis], -(ep - em) / (2 * h), rtol=1e-5, atol=1e-7
        )


def test_numeric_stress(model_and_params):
    """Stress matches central differences under symmetrized strain."""
    model, params, fwd = model_and_params
    frame = make_frame(6)
    data = padded([frame])
    out = fwd(params, data)
    stress = np.asarray(out[_keys.STRESS_KEY][0])
    virial = np.asarray(out[_keys.VIRIAL_KEY][0])
    cell = np.asarray(frame[_keys.CELL_KEY]).reshape(3, 3)
    vol = abs(np.linalg.det(cell))
    np.testing.assert_allclose(virial, -stress * vol, atol=1e-9)

    h = 1e-6
    pos = np.asarray(frame[_keys.POSITIONS_KEY])
    for a, b in [(0, 0), (0, 1), (2, 2)]:
        es = []
        for s in (+h, -h):
            eps = np.zeros((3, 3))
            eps[a, b] = s
            eps = 0.5 * (eps + eps.T)
            f2 = dict(frame)
            f2[_keys.POSITIONS_KEY] = pos @ (np.eye(3) + eps)
            f2[_keys.CELL_KEY] = frame[_keys.CELL_KEY].reshape(3, 3) @ (np.eye(3) + eps)
            es.append(float(fwd(params, padded([f2]))[_keys.TOTAL_ENERGY_KEY][0, 0]))
        dE = (es[0] - es[1]) / (2 * h)
        np.testing.assert_allclose(dE, stress[a, b] * vol, rtol=5e-4, atol=1e-7)


def test_isolated_atom_energies(model_and_params):
    """Atoms beyond the cutoff have exactly the per-type shift energy."""
    model, params, fwd = model_and_params
    frame = from_dict(
        {
            _keys.POSITIONS_KEY: np.array(
                [[0.0, 0.0, 0.0], [100.0, 0.0, 0.0], [0.0, 100.0, 0.0]]
            ),
            _keys.ATOM_TYPE_KEY: np.array([0, 1, 0]),
            _keys.ATOMIC_NUMBERS_KEY: np.array([29, 1, 29]),
        }
    )
    frame = compute_neighborlist_(frame, R_MAX)
    assert frame[_keys.EDGE_INDEX_KEY].shape[1] == 0
    out = fwd(params, padded([frame]))
    expected = SHIFTS["Cu"] * 2 + SHIFTS["H"]
    np.testing.assert_allclose(
        float(out[_keys.TOTAL_ENERGY_KEY][0, 0]), expected, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out[_keys.PER_ATOM_ENERGY_KEY][:3]).reshape(-1),
        [SHIFTS["Cu"], SHIFTS["H"], SHIFTS["Cu"]],
        atol=1e-10,
    )
    # forces identically zero for isolated atoms
    np.testing.assert_allclose(np.asarray(out[_keys.FORCE_KEY][:3]), 0.0, atol=1e-12)
