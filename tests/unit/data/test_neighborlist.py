import numpy as np
import pytest

from nequip_tpu.data import neighbor_list


def brute_force_nl(pos, r_max, cell=None, pbc=(False, False, False)):
    """O(N^2 x images) reference implementation."""
    n = len(pos)
    pbc = np.asarray(pbc)
    if cell is None or not pbc.any():
        shifts = [np.zeros(3)]
        cell_m = np.zeros((3, 3))
    else:
        cell_m = np.asarray(cell).reshape(3, 3)
        inv = np.linalg.inv(cell_m)
        heights = 1.0 / np.linalg.norm(inv, axis=0)
        nr = np.where(pbc, np.ceil(r_max / heights).astype(int), 0)
        shifts = [
            np.array([i, j, k], dtype=float)
            for i in range(-nr[0], nr[0] + 1)
            for j in range(-nr[1], nr[1] + 1)
            for k in range(-nr[2], nr[2] + 1)
        ]
    edges = set()
    for i in range(n):
        for j in range(n):
            for s in shifts:
                if i == j and np.all(s == 0):
                    continue
                d = np.linalg.norm(pos[j] + s @ cell_m - pos[i])
                if d <= r_max:
                    edges.add((i, j) + tuple(int(x) for x in s))
    return edges


def to_set(edge_index, shifts):
    return {
        (int(edge_index[0, e]), int(edge_index[1, e]))
        + tuple(int(x) for x in shifts[e])
        for e in range(edge_index.shape[1])
    }


def test_open_boundary():
    pos = np.random.RandomState(0).uniform(0, 10, (40, 3))
    ei, sh = neighbor_list(pos, 3.0)
    assert to_set(ei, sh) == brute_force_nl(pos, 3.0)
    # directed symmetry
    s = to_set(ei, sh)
    assert all((j, i, -a, -b, -c) in s for (i, j, a, b, c) in s)


def test_pbc_orthorhombic():
    r = np.random.RandomState(1)
    cell = np.diag([6.0, 7.0, 8.0])
    pos = r.uniform(0, 6, (30, 3))
    ei, sh = neighbor_list(pos, 3.5, cell=cell, pbc=(True, True, True))
    assert to_set(ei, sh) == brute_force_nl(pos, 3.5, cell, (True, True, True))


def test_pbc_triclinic():
    r = np.random.RandomState(2)
    cell = np.array([[6.0, 0, 0], [2.0, 6.0, 0], [1.0, -1.5, 7.0]])
    frac = r.uniform(0, 1, (25, 3))
    pos = frac @ cell
    ei, sh = neighbor_list(pos, 3.0, cell=cell, pbc=(True, True, True))
    assert to_set(ei, sh) == brute_force_nl(pos, 3.0, cell, (True, True, True))


def test_pbc_mixed():
    r = np.random.RandomState(3)
    cell = np.diag([5.0, 5.0, 20.0])
    pos = r.uniform(0, 5, (20, 3))
    ei, sh = neighbor_list(pos, 3.0, cell=cell, pbc=(True, True, False))
    assert to_set(ei, sh) == brute_force_nl(pos, 3.0, cell, (True, True, False))
    assert np.all(sh[:, 2] == 0)


def test_small_cell_multiple_images():
    """Cell smaller than cutoff: multiple periodic images of the same pair."""
    cell = np.diag([2.0, 2.0, 2.0])
    pos = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    ei, sh = neighbor_list(pos, 4.0, cell=cell, pbc=(True, True, True))
    assert to_set(ei, sh) == brute_force_nl(pos, 4.0, cell, (True, True, True))
    # self-edges through periodic images must exist
    assert np.any(ei[0] == ei[1])


def test_isolated_atom():
    ei, sh = neighbor_list(np.zeros((1, 3)), 3.0)
    assert ei.shape == (2, 0)


# ---------------------------------------------------------------------------
# native C++ backend parity (vs brute force, same cases as the kdtree tests)
# ---------------------------------------------------------------------------
import pytest


def _cpp_available():
    from nequip_tpu.data._cpp_nl import get_lib

    return get_lib() is not None


@pytest.mark.skipif(not _cpp_available(), reason="no C++ toolchain")
@pytest.mark.parametrize(
    "case",
    ["open", "ortho", "triclinic", "mixed", "small_cell"],
)
def test_cpp_backend_parity(case):
    r = np.random.RandomState(42)
    if case == "open":
        pos, cell, pbc = r.uniform(0, 10, (40, 3)), None, (False,) * 3
        cut = 3.0
    elif case == "ortho":
        cell = np.diag([6.0, 7.0, 8.0])
        pos, pbc, cut = r.uniform(0, 6, (30, 3)), (True,) * 3, 3.5
    elif case == "triclinic":
        cell = np.array([[6.0, 0, 0], [2.0, 6.0, 0], [1.0, -1.5, 7.0]])
        pos = r.uniform(0, 1, (25, 3)) @ cell
        pbc, cut = (True,) * 3, 3.0
    elif case == "mixed":
        cell = np.diag([5.0, 5.0, 20.0])
        pos, pbc, cut = r.uniform(0, 5, (20, 3)), (True, True, False), 3.0
    else:  # small_cell: multiple periodic images
        cell = np.diag([2.0, 2.0, 2.0])
        pos = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
        pbc, cut = (True,) * 3, 4.0
    ei, sh = neighbor_list(pos, cut, cell=cell, pbc=pbc, backend="cpp")
    assert to_set(ei, sh) == brute_force_nl(pos, cut, cell, pbc)


@pytest.mark.parametrize("backend", ["kdtree", "cpp"])
def test_unwrapped_positions(backend):
    """Atoms that diffused several box lengths out of the cell (unwrapped MD
    trajectories) must see exactly the same edge set, with shifts expressed
    for the ORIGINAL positions (vec = pos[src] - pos[dst] + shift @ cell)."""
    if backend == "cpp" and not _cpp_available():
        pytest.skip("no C++ toolchain")
    r = np.random.RandomState(3)
    cell = np.diag([6.0, 7.0, 8.0])
    pos = r.uniform(0, 6, (24, 3))
    # send atoms many boxes away (integer lattice offsets keep physics equal)
    offsets = r.randint(-4, 5, (24, 3)).astype(float) @ cell
    far = pos + offsets
    cut = 3.2

    ref = brute_force_nl(pos, cut, cell, (True,) * 3)
    ei, sh = neighbor_list(far, cut, cell=cell, pbc=(True,) * 3, backend=backend)
    # re-express the brute-force reference in terms of the unwrapped positions
    w = np.round(offsets @ np.linalg.inv(cell)).astype(int)
    shifted_ref = {
        (d, s) + tuple(np.array(shift) + w[d] - w[s])
        for (d, s, *shift) in ref
    }
    assert to_set(ei, sh) == shifted_ref
    # and the returned geometry must be consistent: |vec| <= cutoff
    vec = far[ei[1]] - far[ei[0]] + sh @ cell
    assert np.all(np.linalg.norm(vec, axis=1) <= cut + 1e-9)
