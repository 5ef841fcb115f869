"""ShardDataset: round trips, metadata, zero-copy reads, loader integration.

Mirrors what the reference tests for its LMDB datasets
(``/root/reference/tests/unit/data/test_lmdb_dataset.py``): write-read
round trips from an iterator, metadata retrieval, and use as a normal
dataset in the loading pipeline.
"""

import multiprocessing
import os

import numpy as np
import pytest

from nequip_tpu.data import _keys, DataLoader
from nequip_tpu.data.dataset import LJTestDataset, ShardDataset
from nequip_tpu.data.transforms import NeighborListTransform


def _frames(n=7, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        na = int(rng.randint(3, 9))
        out.append(
            {
                _keys.POSITIONS_KEY: rng.standard_normal((na, 3)),
                _keys.ATOMIC_NUMBERS_KEY: rng.randint(1, 10, na).astype(np.int64),
                _keys.TOTAL_ENERGY_KEY: np.asarray([[rng.standard_normal()]]),
                _keys.FORCE_KEY: rng.standard_normal((na, 3)).astype(np.float32),
                _keys.PBC_KEY: np.array([True, False, True]),
            }
        )
    return out


def test_roundtrip(tmp_path):
    frames = _frames()
    path = str(tmp_path / "data.nqs")
    ShardDataset.save_from_iterator(path, iter(frames))
    ds = ShardDataset(path)
    assert len(ds) == len(frames)
    for i, ref in enumerate(frames):
        got = ds.get_frame(i)
        assert set(got) == set(ref)
        for k in ref:
            np.testing.assert_array_equal(got[k], ref[k])
            assert got[k].dtype == np.asarray(ref[k]).dtype
    with pytest.raises(IndexError):
        ds.get_frame(len(frames))


def test_metadata(tmp_path):
    frames = _frames(5)
    path = str(tmp_path / "data.nqs")
    ShardDataset.save_from_iterator(
        path,
        iter(frames),
        metadata={
            "cutoff": 4.5,
            "type_names": ["H", "C"],
            "counts": np.arange(5),
        },
    )
    ds = ShardDataset(path)
    # auto-collected num_atoms_per_entry (same convention as the reference
    # LMDB writer, lmdb_dataset.py save_from_iterator)
    npe = ds.get_metadata("num_atoms_per_entry")
    np.testing.assert_array_equal(
        npe, [len(f[_keys.POSITIONS_KEY]) for f in frames]
    )
    assert float(ds.get_metadata("cutoff")) == 4.5
    assert ds.get_metadata("type_names") == ["H", "C"]
    np.testing.assert_array_equal(ds.get_metadata("counts"), np.arange(5))
    assert ds.get_metadata("missing") is None


def test_zero_copy_views(tmp_path):
    frames = _frames(3)
    path = str(tmp_path / "data.nqs")
    ShardDataset.save_from_iterator(path, iter(frames))
    ds = ShardDataset(path)
    pos = ds.get_frame(0)[_keys.POSITIONS_KEY]
    # reads are views into the mmap: no ownership, not writeable
    assert not pos.flags.owndata
    assert not pos.flags.writeable


def test_in_loader_pipeline(tmp_path):
    # shard a real labeled dataset and train-load it through the normal
    # transform + padded-batch pipeline
    src = LJTestDataset(num_frames=6, supercell=(1, 1, 2), seed=1)
    path = str(tmp_path / "lj.nqs")
    ShardDataset.save_from_iterator(
        path, (src.get_frame(i) for i in range(len(src)))
    )
    ds = ShardDataset(path, transforms=[NeighborListTransform(r_max=3.0)])
    loader = DataLoader(ds, batch_size=3, shuffle=False)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b[_keys.POSITIONS_KEY].ndim == 2
    assert _keys.EDGE_INDEX_KEY in b
    # contents match the source dataset
    f0 = src.get_frame(0)
    n0 = len(f0[_keys.POSITIONS_KEY])
    np.testing.assert_allclose(
        np.asarray(b[_keys.POSITIONS_KEY][:n0]), f0[_keys.POSITIONS_KEY]
    )


def _read_entry(path, idx, q):
    ds = ShardDataset(path)
    q.put(np.asarray(ds.get_frame(idx)[_keys.POSITIONS_KEY]).sum())


def test_fork_safety(tmp_path):
    # open in the parent, then read from forked workers (dataloader pattern);
    # the mmap is re-opened per-pid like the reference's lazy LMDB env
    frames = _frames(4)
    path = str(tmp_path / "data.nqs")
    ShardDataset.save_from_iterator(path, iter(frames))
    ds = ShardDataset(path)
    ds.get_frame(0)  # force parent open
    ctx = multiprocessing.get_context("fork")
    q = ctx.Queue()
    procs = [ctx.Process(target=_read_entry, args=(path, i, q)) for i in range(4)]
    for p in procs:
        p.start()
    vals = sorted(q.get(timeout=30) for _ in procs)
    for p in procs:
        p.join()
    ref = sorted(f[_keys.POSITIONS_KEY].sum() for f in frames)
    np.testing.assert_allclose(vals, ref)
