import numpy as np

from nequip_tpu.data import _keys
from nequip_tpu.data.dataset import LJTestDataset, lj_reference


def test_lj_forces_match_finite_difference():
    ds = LJTestDataset(supercell=(1, 1, 1), num_frames=1, seed=7)
    frame = ds.frames[0]
    pos = frame[_keys.POSITIONS_KEY]
    cell = frame[_keys.CELL_KEY]
    params = ds.lj_params

    labels = lj_reference(pos, cell, (True, True, True), **params)
    h = 1e-6
    for atom, axis in [(0, 0), (1, 2), (2, 1)]:
        pp = pos.copy()
        pp[atom, axis] += h
        ep = lj_reference(pp, cell, (True, True, True), **params)[_keys.TOTAL_ENERGY_KEY][0, 0]
        pm = pos.copy()
        pm[atom, axis] -= h
        em = lj_reference(pm, cell, (True, True, True), **params)[_keys.TOTAL_ENERGY_KEY][0, 0]
        f_num = -(ep - em) / (2 * h)
        np.testing.assert_allclose(
            labels[_keys.FORCE_KEY][atom, axis], f_num, rtol=1e-6, atol=1e-8
        )


def test_lj_stress_matches_finite_difference():
    """stress_ab = (1/V) dE/deps_ab under pos,cell -> (1+eps) deformation."""
    ds = LJTestDataset(supercell=(1, 1, 1), num_frames=1, seed=8)
    frame = ds.frames[0]
    pos = frame[_keys.POSITIONS_KEY]
    cell = frame[_keys.CELL_KEY].reshape(3, 3)
    params = ds.lj_params
    labels = lj_reference(pos, cell, (True, True, True), **params)
    vol = abs(np.linalg.det(cell))

    h = 1e-6
    for a, b in [(0, 0), (1, 1), (0, 1)]:
        num = []
        for s in (+h, -h):
            eps = np.zeros((3, 3))
            eps[a, b] = s
            eps = 0.5 * (eps + eps.T)  # symmetrized strain
            P = pos @ (np.eye(3) + eps)
            C = cell @ (np.eye(3) + eps)
            num.append(
                lj_reference(P, C, (True, True, True), **params)[_keys.TOTAL_ENERGY_KEY][0, 0]
            )
        dE = (num[0] - num[1]) / (2 * h)
        # the symmetrized strain puts h/2 on (a,b) and (b,a); with symmetric
        # stress this gives dE/dh = stress[a,b] * V for every component
        expected = labels[_keys.STRESS_KEY][0, a, b] * vol
        np.testing.assert_allclose(dE, expected, rtol=1e-4, atol=1e-7)
    # virial = -stress * V
    np.testing.assert_allclose(
        labels[_keys.VIRIAL_KEY], -labels[_keys.STRESS_KEY] * vol, atol=1e-12
    )


def test_dataset_deterministic():
    d1 = LJTestDataset(num_frames=2, seed=5)
    d2 = LJTestDataset(num_frames=2, seed=5)
    np.testing.assert_array_equal(
        d1.frames[1][_keys.POSITIONS_KEY], d2.frames[1][_keys.POSITIONS_KEY]
    )
    f = d1[0]
    assert _keys.TOTAL_ENERGY_KEY in f and _keys.STRESS_KEY in f
