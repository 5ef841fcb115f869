"""NPZ / HDF5 dataset round trips and the loader's capacity bucketing."""

import numpy as np
import pytest

from nequip_tpu.data import _keys, DataLoader
from nequip_tpu.data.dataset import HDF5Dataset, NPZDataset, LJTestDataset
from nequip_tpu.data.transforms import (
    ChemicalSpeciesToAtomTypeMapper,
    NeighborListTransform,
)


def test_npz_dataset(tmp_path):
    r = np.random.RandomState(0)
    n_frames, n_atoms = 4, 5
    path = str(tmp_path / "data.npz")
    np.savez(
        path,
        R=r.standard_normal((n_frames, n_atoms, 3)) * 3,
        E=r.standard_normal(n_frames),
        F=r.standard_normal((n_frames, n_atoms, 3)),
        z=np.array([6, 1, 1, 8, 1]),
    )
    ds = NPZDataset(path)
    assert len(ds) == 4
    f = ds[1]
    assert f[_keys.POSITIONS_KEY].shape == (5, 3)
    assert f[_keys.TOTAL_ENERGY_KEY].shape == (1, 1)
    assert f[_keys.FORCE_KEY].shape == (5, 3)
    np.testing.assert_array_equal(
        f[_keys.ATOMIC_NUMBERS_KEY].reshape(-1), [6, 1, 1, 8, 1]
    )


def test_hdf5_dataset(tmp_path):
    import h5py

    r = np.random.RandomState(1)
    path = str(tmp_path / "data.h5")
    with h5py.File(path, "w") as f:
        for i in range(3):
            g = f.create_group(f"frame_{i}")
            g["pos"] = r.standard_normal((4, 3))
            g["atomic_numbers"] = np.array([29] * 4)
            g["energy"] = np.array(r.standard_normal())
    ds = HDF5Dataset(path)
    assert len(ds) == 3
    frame = ds[2]
    assert frame[_keys.POSITIONS_KEY].shape == (4, 3)
    assert frame[_keys.TOTAL_ENERGY_KEY].shape == (1, 1)


def test_loader_capacity_and_determinism():
    ds = LJTestDataset(
        num_frames=6,
        seed=9,
        transforms=[
            ChemicalSpeciesToAtomTypeMapper(["Cu"]),
            NeighborListTransform(r_max=4.0),
        ],
    )
    loader = DataLoader(ds, batch_size=2, shuffle=True, seed=3, device=False)
    cap = loader.capacity
    assert cap["n_nodes"] % 64 == 0 and cap["n_edges"] % 64 == 0
    batches1 = [b[_keys.POSITIONS_KEY].copy() for b in loader]
    # next epoch shuffles differently
    batches2 = [b[_keys.POSITIONS_KEY].copy() for b in loader]
    assert any(not np.allclose(a, b) for a, b in zip(batches1, batches2))
    # resetting epoch state reproduces epoch 0 exactly
    loader.load_state_dict({"epoch": 0})
    batches3 = [b[_keys.POSITIONS_KEY].copy() for b in loader]
    for a, b in zip(batches1, batches3):
        np.testing.assert_array_equal(a, b)
    # every batch has identical (static) shapes
    shapes = {b.shape for b in batches1}
    assert len(shapes) == 1
