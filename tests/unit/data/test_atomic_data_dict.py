import numpy as np
import pytest

from nequip_tpu.data import (
    _keys,
    from_dict,
    batched_from_list,
    frame_from_batched,
    pad_batch,
    without_nodes,
    compute_neighborlist_,
)


def make_frame(n, seed, with_cell=True):
    r = np.random.RandomState(seed)
    frame = {
        _keys.POSITIONS_KEY: r.uniform(0, 5, (n, 3)),
        _keys.ATOMIC_NUMBERS_KEY: r.choice([1, 6, 8], n),
        _keys.ATOM_TYPE_KEY: r.randint(0, 3, n),
        _keys.TOTAL_ENERGY_KEY: r.standard_normal(),
        _keys.FORCE_KEY: r.standard_normal((n, 3)),
    }
    if with_cell:
        frame[_keys.CELL_KEY] = np.diag([5.0, 5.0, 5.0])
        frame[_keys.PBC_KEY] = np.array([True] * 3)
    data = from_dict(frame)
    return compute_neighborlist_(data, r_max=2.5)


def test_from_dict_canonicalization():
    data = make_frame(5, 0)
    assert data[_keys.CELL_KEY].shape == (1, 3, 3)
    assert data[_keys.TOTAL_ENERGY_KEY].shape == (1, 1)
    assert data[_keys.ATOM_TYPE_KEY].dtype == np.int32
    assert data[_keys.NUM_NODES_KEY].tolist() == [5]


def test_batch_unbatch_roundtrip():
    frames = [make_frame(n, seed) for seed, n in enumerate([4, 7, 5])]
    batch = batched_from_list(frames)
    assert batch[_keys.POSITIONS_KEY].shape[0] == 16
    assert batch[_keys.BATCH_KEY].tolist() == [0] * 4 + [1] * 7 + [2] * 5
    for i, frame in enumerate(frames):
        rec = frame_from_batched(batch, i)
        np.testing.assert_array_equal(rec[_keys.POSITIONS_KEY], frame[_keys.POSITIONS_KEY])
        np.testing.assert_array_equal(rec[_keys.CELL_KEY], frame[_keys.CELL_KEY])
        # edges may be reordered; compare as sets with shifts
        def eset(f):
            ei = f[_keys.EDGE_INDEX_KEY]
            sh = f[_keys.EDGE_CELL_SHIFT_KEY]
            return {
                (int(ei[0, e]), int(ei[1, e])) + tuple(sh[e])
                for e in range(ei.shape[1])
            }
        assert eset(rec) == eset(frame)


def test_pad_batch_and_roundtrip():
    frames = [make_frame(n, seed) for seed, n in enumerate([4, 6])]
    batch = batched_from_list(frames)
    E = batch[_keys.EDGE_INDEX_KEY].shape[1]
    padded = pad_batch(batch, n_nodes=16, n_edges=E + 10, n_frames=4)
    assert padded[_keys.POSITIONS_KEY].shape == (16, 3)
    assert padded[_keys.NODE_MASK_KEY].sum() == 10
    assert padded[_keys.EDGE_MASK_KEY].sum() == E
    assert padded[_keys.FRAME_MASK_KEY].tolist() == [True, True, False, False]
    # padded nodes assigned to the padded frame
    assert np.all(padded[_keys.BATCH_KEY][10:] == 3)
    # unbatching padded data recovers the original frames
    for i, frame in enumerate(frames):
        rec = frame_from_batched(padded, i)
        np.testing.assert_array_equal(rec[_keys.POSITIONS_KEY], frame[_keys.POSITIONS_KEY])


def test_pad_capacity_too_small_raises():
    batch = batched_from_list([make_frame(5, 0)])
    with pytest.raises(AssertionError):
        pad_batch(batch, n_nodes=3, n_edges=1000)


def test_without_nodes():
    frame = make_frame(6, 1)
    out = without_nodes(frame, np.array([0, 3]))
    assert out[_keys.POSITIONS_KEY].shape[0] == 4
    ei = out[_keys.EDGE_INDEX_KEY]
    assert ei.size == 0 or ei.max() < 4
    np.testing.assert_array_equal(
        out[_keys.POSITIONS_KEY], frame[_keys.POSITIONS_KEY][[1, 2, 4, 5]]
    )


def test_inconsistent_keys_raise():
    f1 = make_frame(4, 0)
    f2 = make_frame(4, 1)
    del f2[_keys.FORCE_KEY]
    with pytest.raises(KeyError):
        batched_from_list([f1, f2])
