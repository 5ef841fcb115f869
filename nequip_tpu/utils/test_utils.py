"""Shipped equivariance / permutation test harness.

Parity: ``/root/reference/nequip/utils/test.py:45-504`` — a reusable
assertion library (packaged, like the reference's ``utils/unittests``) so
extension packages can gate their own models on the same physics checks:

* ``assert_permutation_equivariant`` — outputs permute consistently with a
  random node permutation;
* ``assert_O3_equivariant`` — scalars invariant, vectors/forces rotate,
  cartesian rank-2 tensors (stress/virial) conjugate, under proper and
  improper rotations.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from ..data import _keys, batched_from_list, pad_batch, to_device
from ..data._key_registry import _CARTESIAN_TENSOR_FIELDS, get_field_type
from ..ops.cg import random_rotation

_DEFAULT_TOLERANCES = {"float32": 1e-3, "float64": 1e-8}


def _run(model, params, frame, capacities):
    import jax

    batch = pad_batch(batched_from_list([frame]), *capacities)
    return model(params, to_device(batch))


def assert_permutation_equivariant(
    model, params, frame: dict, capacities=(128, 1024, 2), tol: Optional[float] = None, seed: int = 0
):
    tol = tol or _DEFAULT_TOLERANCES[str(np.dtype(np.float64))] if tol is None else tol
    n = frame[_keys.POSITIONS_KEY].shape[0]
    perm = np.random.RandomState(seed).permutation(n)
    inv = np.empty(n, dtype=np.int32)
    inv[perm] = np.arange(n, dtype=np.int32)

    out = _run(model, params, frame, capacities)

    frame_p = dict(frame)
    for k, v in frame.items():
        if get_field_type(k, error_on_unregistered=False) == "node":
            frame_p[k] = np.asarray(v)[perm]
    frame_p[_keys.EDGE_INDEX_KEY] = inv[frame[_keys.EDGE_INDEX_KEY]]
    out_p = _run(model, params, frame_p, capacities)

    for k in out:
        if not hasattr(out[k], "dtype") or out[k].dtype.kind in "bi":
            continue  # masks / index fields
        ftype = get_field_type(k, error_on_unregistered=False)
        if ftype == "node":
            a = np.asarray(out[k])[:n][perm]
            b = np.asarray(out_p[k])[:n]
        elif ftype == "graph":
            a = np.asarray(out[k])[:1]
            b = np.asarray(out_p[k])[:1]
        else:
            continue
        err = np.abs(a - b).max() if a.size else 0.0
        assert err <= tol, f"permutation equivariance failed for {k}: {err:.2e}"


def assert_O3_equivariant(
    model,
    params,
    frame: dict,
    capacities=(128, 1024, 2),
    tol: float = 1e-8,
    n_trials: int = 2,
    test_parity: bool = True,
    seed: int = 0,
):
    rng = np.random.RandomState(seed)
    n = frame[_keys.POSITIONS_KEY].shape[0]
    out = _run(model, params, frame, capacities)

    rotations = [random_rotation(rng) for _ in range(n_trials)]
    if test_parity:
        rotations += [-random_rotation(rng)]

    for R in rotations:
        frame_r = dict(frame)
        frame_r[_keys.POSITIONS_KEY] = frame[_keys.POSITIONS_KEY] @ R.T
        if _keys.CELL_KEY in frame:
            frame_r[_keys.CELL_KEY] = (
                np.asarray(frame[_keys.CELL_KEY]).reshape(3, 3) @ R.T
            ).reshape(1, 3, 3)
        out_r = _run(model, params, frame_r, capacities)

        # scalars: invariant
        for k in (_keys.TOTAL_ENERGY_KEY, _keys.PER_ATOM_ENERGY_KEY):
            if k in out:
                a, b = np.asarray(out[k]), np.asarray(out_r[k])
                lim = n if get_field_type(k) == "node" else 1
                err = np.abs(a[:lim] - b[:lim]).max()
                assert err <= tol, f"O(3) invariance failed for {k}: {err:.2e}"
        # vectors
        if _keys.FORCE_KEY in out:
            a = np.asarray(out[_keys.FORCE_KEY])[:n] @ R.T
            b = np.asarray(out_r[_keys.FORCE_KEY])[:n]
            err = np.abs(a - b).max()
            assert err <= tol, f"O(3) equivariance failed for forces: {err:.2e}"
        # cartesian rank-2 tensors
        for k in _CARTESIAN_TENSOR_FIELDS:
            if k in out and get_field_type(k) == "graph":
                a = R @ np.asarray(out[k])[0] @ R.T
                b = np.asarray(out_r[k])[0]
                err = np.abs(a - b).max()
                assert err <= tol, f"O(3) equivariance failed for {k}: {err:.2e}"
