"""DataLoader gates: multi-bucket capacity policy and restartable sampling.

The multi-bucket policy is the TPU answer to the reference's dynamic-shape
compilation (``/root/reference/nequip/data/_key_registry.py:212-249``):
quantile capacity buckets bound padding waste for mixed-size (foundation)
datasets at the cost of a few jit signatures.  The PartialSampler wiring is
the reference's restartable mid-pass data position
(``/root/reference/nequip/data/_sampler.py:8-105``).
"""

import numpy as np
import jax
import pytest

from nequip_tpu.data import _keys
from nequip_tpu.data.dataset import InMemoryDataset, LJTestDataset
from nequip_tpu.data.loader import DataLoader
from nequip_tpu.data.transforms import (
    ChemicalSpeciesToAtomTypeMapper,
    NeighborListTransform,
)


def _mixed_dataset():
    """Frames of very different sizes (4 to 108 atoms), like foundation data."""
    transforms = [
        ChemicalSpeciesToAtomTypeMapper(chemical_symbols=["Cu"]),
        NeighborListTransform(r_max=4.0),
    ]
    frames = []
    for sc, nf, seed in [((1, 1, 1), 12, 1), ((2, 1, 1), 4, 2), ((3, 3, 3), 2, 3)]:
        ds = LJTestDataset(supercell=sc, num_frames=nf, seed=seed)
        frames.extend(dict(f) for f in ds.frames)
    return InMemoryDataset(frames, transforms=transforms)


def test_multibucket_reduces_padding_waste():
    ds = _mixed_dataset()
    single = DataLoader(ds, batch_size=2, shuffle=True, seed=5, device=False)
    multi = DataLoader(
        ds, batch_size=2, shuffle=True, seed=5, device=False, n_buckets=4,
        pad_multiple=16,
    )
    for _ in single:
        pass
    for _ in multi:
        pass
    assert len(multi.buckets) > 1
    # mostly-small frames + rare huge ones: the single worst-case bucket
    # wastes most slots; the quantile ladder must cut it below 25%
    assert single.padding_waste() > 0.5
    assert multi.padding_waste() < 0.25, multi.padding_waste()


def test_multibucket_batches_are_exact():
    """Padding to a smaller bucket must not change any real data."""
    ds = _mixed_dataset()
    a = DataLoader(ds, batch_size=2, shuffle=True, seed=5, device=False)
    b = DataLoader(
        ds, batch_size=2, shuffle=True, seed=5, device=False, n_buckets=4,
        pad_multiple=16,
    )
    for ba, bb in zip(a, b):
        n = int(np.sum(ba[_keys.NODE_MASK_KEY]))
        e = int(np.sum(ba[_keys.EDGE_MASK_KEY]))
        assert n == int(np.sum(bb[_keys.NODE_MASK_KEY]))
        assert e == int(np.sum(bb[_keys.EDGE_MASK_KEY]))
        np.testing.assert_array_equal(
            ba[_keys.POSITIONS_KEY][:n], bb[_keys.POSITIONS_KEY][:n]
        )
        np.testing.assert_array_equal(
            ba[_keys.EDGE_INDEX_KEY][:, :e], bb[_keys.EDGE_INDEX_KEY][:, :e]
        )
        # every batch fits in its bucket
        assert bb[_keys.POSITIONS_KEY].shape[0] <= ba[_keys.POSITIONS_KEY].shape[0]


def test_multibucket_jit_signature_count():
    """The number of distinct padded shapes equals the bucket count at most."""
    ds = _mixed_dataset()
    loader = DataLoader(
        ds, batch_size=2, shuffle=True, seed=5, device=False, n_buckets=3,
        pad_multiple=16,
    )
    shapes = set()
    for _ in range(2):  # two epochs: shapes must not grow epoch over epoch
        for b in loader:
            shapes.add(
                (b[_keys.POSITIONS_KEY].shape[0], b[_keys.EDGE_INDEX_KEY].shape[1])
            )
    assert len(shapes) <= len(loader.buckets)


def test_partial_sampler_wiring_and_midpass_resume():
    """num_samples_per_epoch splits one data pass into windows; resuming from
    state_dict continues at the exact position (bit-equal index stream)."""
    ds = _mixed_dataset()  # 18 frames
    mk = lambda: DataLoader(
        ds, batch_size=2, shuffle=True, seed=9, device=False,
        num_samples_per_epoch=6,
    )
    loader = mk()
    assert len(loader) == 3  # 6 samples / batch_size 2

    def epoch_signature(loader):
        sig = []
        for b in loader.host_batches():
            sig.append(np.asarray(b[_keys.POSITIONS_KEY]).sum())
        # host_batches does not advance the epoch; do it like __iter__ does
        loader._epoch += 1
        loader.sampler.step_epoch()
        return sig

    straight = [epoch_signature(loader) for _ in range(6)]
    # windows tile the full shuffle: 3 epochs of 6 cover all 18 frames once
    # (no repeats within a cycle)
    flat = []
    l2 = mk()
    for _ in range(3):
        flat.extend(iter(l2.sampler))
        l2.sampler.step_epoch()
    assert sorted(flat) == list(range(18))

    # resume: run 2 epochs, checkpoint, restore into a fresh loader
    l3 = mk()
    for _ in range(2):
        epoch_signature(l3)
    state = l3.state_dict()
    l4 = mk()
    l4.load_state_dict(state)
    resumed = [epoch_signature(l4) for _ in range(4)]
    np.testing.assert_allclose(
        np.concatenate(resumed), np.concatenate(straight[2:]), rtol=0
    )


def test_per_host_data_sharding():
    """Multi-process shards are disjoint, cover everything, and reproduce the
    single-process stream exactly (reference: per-rank DDP batches)."""
    ds = _mixed_dataset()  # 18 frames
    full = DataLoader(ds, batch_size=2, shuffle=True, seed=4, device=False)
    full_order = full._order()
    shards = []
    for p in range(3):
        l = DataLoader(
            ds, batch_size=2, shuffle=True, seed=4, device=False,
            process_index=p, process_count=3,
        )
        assert len(l) == 3  # 6 frames / batch 2
        shards.append(l._order())
    np.testing.assert_array_equal(np.concatenate(
        [full_order[p::3] for p in range(3)]), np.concatenate(shards))
    assert sorted(np.concatenate(shards)) == sorted(full_order)
    # disjoint
    flat = np.concatenate(shards)
    assert len(set(flat.tolist())) == len(flat)


def test_init_distributed_single_host_noop(monkeypatch):
    from nequip_tpu.parallel import init_distributed

    for v in ("SLURM_JOB_NUM_NODES", "OMPI_COMM_WORLD_SIZE",
              "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(v, raising=False)
    assert init_distributed() is False
