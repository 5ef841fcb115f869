"""Named benchmark datamodules (3BPA/TM23/SAMD23/Water/COLL) — offline gates.

Parity: ``/root/reference/nequip/data/datamodule/__init__.py:1-24``.  The
real datasets need network access; here the expected files are synthesized
locally so the file layout, key mapping, and split wiring are exercised.
"""

import os

import numpy as np
import pytest

from nequip_tpu.data import _keys
from nequip_tpu.data.datamodule import (
    COLLDataModule,
    NequIP3BPADataModule,
    SAMD23DataModule,
    TM23DataModule,
    WaterDataModule,
)
from nequip_tpu.data.transforms import (
    ChemicalSpeciesToAtomTypeMapper,
    NeighborListTransform,
)
from nequip_tpu.data.xyz import write_extxyz

TRANSFORMS = [
    ChemicalSpeciesToAtomTypeMapper(chemical_symbols=["H", "C", "N", "O", "Cu"]),
    NeighborListTransform(r_max=3.0),
]


def _write_frames(path, n, seed=0, with_calc=True, info_energy_key=None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.RandomState(seed)
    frames = []
    for i in range(n):
        frame = {
            _keys.POSITIONS_KEY: rng.uniform(0, 3, (3, 3)),
            _keys.ATOMIC_NUMBERS_KEY: np.array([6, 1, 8]),
            _keys.CELL_KEY: np.eye(3) * 6,
            _keys.PBC_KEY: np.array([True] * 3),
            _keys.TOTAL_ENERGY_KEY: np.array([[rng.standard_normal()]]),
            _keys.FORCE_KEY: rng.standard_normal((3, 3)),
        }
        frames.append(frame)
    write_extxyz(path, frames)
    if info_energy_key:
        # emulate the Water dataset's non-standard key names
        # (TotEnergy info scalar + `force` per-atom columns)
        text = open(path).read()
        text = text.replace("energy=", f"{info_energy_key}=").replace(
            ":forces:", ":force:"
        )
        open(path, "w").write(text)


def _check_loaders(dm, expect_tests=1):
    dm.setup("fit")
    train = dm.train_dataloader()
    batch = next(iter(train))
    assert _keys.POSITIONS_KEY in batch
    assert np.isfinite(np.asarray(batch[_keys.TOTAL_ENERGY_KEY])).any()
    dm.setup("test")
    tests = dm.test_dataloaders()
    assert len(tests) == expect_tests


def test_3bpa(tmp_path):
    d = str(tmp_path)
    _write_frames(os.path.join(d, "dataset_3BPA", "train_300K.xyz"), 8, 1)
    for t in ("300K", "600K"):
        _write_frames(os.path.join(d, "dataset_3BPA", f"test_{t}.xyz"), 2, 2)
    dm = NequIP3BPADataModule(
        seed=1,
        transforms=TRANSFORMS,
        train_val_split=[6, 2],
        data_source_dir=d,
        test_sets=["300K", "600K"],
        train_dataloader={"batch_size": 2},
        val_dataloader={"batch_size": 1},
        test_dataloader={"batch_size": 1},
    )
    _check_loaders(dm, expect_tests=2)


def test_tm23(tmp_path):
    d = str(tmp_path)
    base = os.path.join(d, "benchmarking_master_collection")
    _write_frames(os.path.join(base, "Cu_2700cwm_train.xyz"), 6, 3)
    _write_frames(os.path.join(base, "Cu_2700cwm_test.xyz"), 2, 4)
    dm = TM23DataModule(
        seed=1,
        data_source_dir=d,
        element="Cu",
        transforms=TRANSFORMS,
        train_val_split=[4, 2],
        train_dataloader={"batch_size": 2},
        val_dataloader={"batch_size": 1},
        test_dataloader={"batch_size": 1},
    )
    _check_loaders(dm)


def test_samd23(tmp_path):
    d = str(tmp_path)
    sub = os.path.join(d, "HfO")
    for name, n in [("Trainset", 6), ("Validset", 2), ("Testset", 2), ("OOD", 2)]:
        _write_frames(os.path.join(sub, f"{name}.xyz"), n, hash(name) % 100)
    dm = SAMD23DataModule(
        seed=1,
        transforms=TRANSFORMS,
        data_source_dir=d,
        system="HfO",
        include_ood=True,
        train_dataloader={"batch_size": 2},
        val_dataloader={"batch_size": 1},
        test_dataloader={"batch_size": 1},
    )
    _check_loaders(dm, expect_tests=2)


def test_water(tmp_path):
    d = str(tmp_path)
    _write_frames(
        os.path.join(d, "dataset_1593_eVAng.xyz"),
        10,
        7,
        with_calc=False,
        info_energy_key="TotEnergy",
    )
    dm = WaterDataModule(
        seed=1,
        transforms=TRANSFORMS,
        data_source_dir=d,
        train_val_test_split=[6, 2, 2],
        train_dataloader={"batch_size": 2},
        val_dataloader={"batch_size": 1},
        test_dataloader={"batch_size": 1},
    )
    _check_loaders(dm)


def test_coll(tmp_path):
    d = str(tmp_path)
    for split, n in [("train", 6), ("val", 2), ("test", 2)]:
        _write_frames(os.path.join(d, f"coll_v1.2_AE_{split}.xyz"), n, 11)
    dm = COLLDataModule(
        seed=1,
        transforms=TRANSFORMS,
        data_source_dir=d,
        train_dataloader={"batch_size": 2},
        val_dataloader={"batch_size": 1},
        test_dataloader={"batch_size": 1},
    )
    _check_loaders(dm)


def test_offline_download_error_is_clear(tmp_path):
    dm = COLLDataModule(
        seed=1, transforms=TRANSFORMS, data_source_dir=str(tmp_path)
    )
    with pytest.raises(RuntimeError, match="offline|download|place the file"):
        dm.prepare_data()


def test_extxyz_roundtrip(tmp_path):
    """write_extxyz -> read_extxyz is lossless for the canonical fields."""
    from nequip_tpu.data.xyz import read_extxyz

    rng = np.random.RandomState(5)
    frames = [
        {
            _keys.POSITIONS_KEY: rng.uniform(0, 4, (4, 3)),
            _keys.ATOMIC_NUMBERS_KEY: np.array([29, 29, 1, 8]),
            _keys.CELL_KEY: rng.uniform(3, 6, (3, 3)),
            _keys.PBC_KEY: np.array([True, True, False]),
            _keys.TOTAL_ENERGY_KEY: np.array([[-12.5]]),
            _keys.FORCE_KEY: rng.standard_normal((4, 3)),
        }
        for _ in range(3)
    ]
    path = str(tmp_path / "rt.extxyz")
    write_extxyz(path, frames)
    back = read_extxyz(path)
    assert len(back) == 3
    for a, b in zip(frames, back):
        np.testing.assert_allclose(b[_keys.POSITIONS_KEY], a[_keys.POSITIONS_KEY], atol=1e-9)
        np.testing.assert_array_equal(b[_keys.ATOMIC_NUMBERS_KEY], a[_keys.ATOMIC_NUMBERS_KEY])
        np.testing.assert_allclose(b[_keys.CELL_KEY], a[_keys.CELL_KEY], atol=1e-9)
        np.testing.assert_array_equal(b[_keys.PBC_KEY], a[_keys.PBC_KEY])
        np.testing.assert_allclose(
            float(np.asarray(b[_keys.TOTAL_ENERGY_KEY]).reshape(-1)[0]), -12.5, atol=1e-9
        )
        np.testing.assert_allclose(b[_keys.FORCE_KEY], a[_keys.FORCE_KEY], atol=1e-9)
