"""Shipped, reusable model test suite for extension packages.

Parity: ``/root/reference/nequip/utils/unittests/model_tests_basic.py`` +
``model_tests.py`` — the reference packages its physics test mixins so
extension models (e.g. Allegro-style architectures) can subclass the same
gates.  Usage in an extension package:

.. code-block:: python

    from nequip_tpu.utils.unittests import BaseEnergyModelTests

    class TestMyModel(BaseEnergyModelTests):
        @pytest.fixture(scope="class", params=[...])
        def model_config(self, request):
            return request.param  # dict accepted by your @model_builder

Gates: forward output contract, padding invariance, batched-vs-single
consistency, O(3)+permutation equivariance, numeric-vs-autodiff forces,
isolated-atom energies.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ...data import (
    _keys,
    batched_from_list,
    compute_neighborlist_,
    from_dict,
    pad_batch,
    to_device,
)
from ...utils.config import instantiate
from ..test_utils import assert_O3_equivariant, assert_permutation_equivariant

_CAPS = (128, 2048, 3)


def _padded(frames, caps=_CAPS):
    return to_device(pad_batch(batched_from_list(frames), *caps))


class BaseEnergyModelTests:
    """Subclass and provide a ``model_config`` fixture (dict with _target_)."""

    # -- fixtures extensions may override -------------------------------
    @pytest.fixture(scope="class")
    def r_max(self, model_config):
        return float(model_config.get("r_max", 4.0))

    @pytest.fixture(scope="class")
    def n_types(self, model_config):
        return len(model_config.get("type_names", ["Cu"]))

    @pytest.fixture(scope="class")
    def model_and_params(self, model_config):
        model = instantiate(model_config)
        return model, model.init_params()

    @pytest.fixture(scope="class")
    def fwd(self, model_and_params):
        model, _ = model_and_params
        return jax.jit(lambda p, d: model(p, d))

    @pytest.fixture(scope="class")
    def frame(self, r_max, n_types):
        rng = np.random.RandomState(7)
        n = 24
        f = from_dict(
            {
                _keys.POSITIONS_KEY: rng.uniform(0, 7.0, (n, 3)),
                _keys.CELL_KEY: np.diag([7.0, 7.0, 7.0]),
                _keys.PBC_KEY: np.array([True] * 3),
                _keys.ATOM_TYPE_KEY: rng.randint(0, n_types, n),
                _keys.ATOMIC_NUMBERS_KEY: np.full(n, 29),
            }
        )
        return compute_neighborlist_(f, r_max)

    # -- gates -----------------------------------------------------------
    def test_forward_contract(self, model_and_params, fwd, frame):
        _, params = model_and_params
        out = fwd(params, _padded([frame]))
        assert _keys.TOTAL_ENERGY_KEY in out and _keys.PER_ATOM_ENERGY_KEY in out
        assert np.isfinite(float(out[_keys.TOTAL_ENERGY_KEY][0, 0]))

    def test_padding_invariance(self, model_and_params, fwd, frame):
        model, params = model_and_params
        o1 = fwd(params, _padded([frame]))
        o2 = jax.jit(lambda p, d: model(p, d))(
            params, _padded([frame], caps=(256, 4096, 4))
        )
        np.testing.assert_allclose(
            float(o1[_keys.TOTAL_ENERGY_KEY][0, 0]),
            float(o2[_keys.TOTAL_ENERGY_KEY][0, 0]),
            rtol=1e-9,
        )

    def test_batched_vs_single(self, model_and_params, fwd, frame, r_max, n_types):
        _, params = model_and_params
        rng = np.random.RandomState(8)
        f2 = from_dict(
            {
                _keys.POSITIONS_KEY: rng.uniform(0, 7.0, (10, 3)),
                _keys.CELL_KEY: np.diag([7.0, 7.0, 7.0]),
                _keys.PBC_KEY: np.array([True] * 3),
                _keys.ATOM_TYPE_KEY: rng.randint(0, n_types, 10),
                _keys.ATOMIC_NUMBERS_KEY: np.full(10, 29),
            }
        )
        f2 = compute_neighborlist_(f2, r_max)
        ob = fwd(params, _padded([frame, f2]))
        o1 = fwd(params, _padded([frame]))
        np.testing.assert_allclose(
            float(ob[_keys.TOTAL_ENERGY_KEY][0, 0]),
            float(o1[_keys.TOTAL_ENERGY_KEY][0, 0]),
            rtol=1e-9,
        )

    def test_equivariance(self, model_and_params, frame):
        model, params = model_and_params
        assert_O3_equivariant(model, params, frame, capacities=_CAPS, tol=1e-7)
        assert_permutation_equivariant(model, params, frame, capacities=_CAPS, tol=1e-8)

    def test_numeric_gradient(self, model_and_params, fwd, frame):
        _, params = model_and_params
        data = _padded([frame])
        out = fwd(params, data)
        if _keys.FORCE_KEY not in out:
            pytest.skip("model has no force output")
        forces = np.asarray(out[_keys.FORCE_KEY])
        h = 1e-5
        pos = np.asarray(data[_keys.POSITIONS_KEY])
        for atom, axis in [(0, 0), (3, 2)]:
            es = []
            for sgn in (+h, -h):
                p2 = pos.copy()
                p2[atom, axis] += sgn
                d2 = dict(data)
                d2[_keys.POSITIONS_KEY] = jnp.asarray(p2)
                es.append(float(fwd(params, d2)[_keys.TOTAL_ENERGY_KEY][0, 0]))
            np.testing.assert_allclose(
                forces[atom, axis], -(es[0] - es[1]) / (2 * h), rtol=1e-4, atol=1e-6
            )

    def test_isolated_atom_energies(self, model_and_params, fwd, r_max, n_types):
        _, params = model_and_params
        f = from_dict(
            {
                _keys.POSITIONS_KEY: np.array(
                    [[0.0, 0.0, 0.0], [100.0, 0.0, 0.0]]
                ),
                _keys.ATOM_TYPE_KEY: np.array([0, min(1, n_types - 1)]),
                _keys.ATOMIC_NUMBERS_KEY: np.array([29, 29]),
            }
        )
        f = compute_neighborlist_(f, r_max)
        out = fwd(params, _padded([f]))
        e_pair = np.asarray(out[_keys.PER_ATOM_ENERGY_KEY][:2]).reshape(-1)
        # energies of atoms beyond the cutoff must be independent (equal for
        # same types, and forces exactly zero)
        if _keys.FORCE_KEY in out:
            np.testing.assert_allclose(
                np.asarray(out[_keys.FORCE_KEY][:2]), 0.0, atol=1e-10
            )
        assert np.all(np.isfinite(e_pair))
