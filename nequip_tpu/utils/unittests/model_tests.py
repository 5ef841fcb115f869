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

    def test_isolated_atom_energies(self, model_and_params, fwd, model_config, r_max, n_types):
        """Isolated atoms restore exactly the configured per-type energy
        shifts (parity: ``model_tests_basic.py:927-957``) — the readout
        contribution of an edge-less atom must be exactly zero."""
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
        shifts = model_config.get("per_type_energy_shifts")
        if isinstance(shifts, dict):
            type_names = model_config["type_names"]
            expected = [
                shifts[type_names[0]],
                shifts[type_names[min(1, n_types - 1)]],
            ]
            np.testing.assert_allclose(e_pair, expected, rtol=1e-10, atol=1e-12)

    def test_cross_frame_grad(self, model_and_params, frame, r_max, n_types):
        """Gradient of one frame's total energy w.r.t. another frame's
        positions must be exactly zero (padding/batching leakage gate;
        parity: ``model_tests_basic.py:598-630``)."""
        model, params = model_and_params
        rng = np.random.RandomState(21)
        f2 = from_dict(
            {
                _keys.POSITIONS_KEY: rng.uniform(0, 7.0, (12, 3)),
                _keys.CELL_KEY: np.diag([7.0, 7.0, 7.0]),
                _keys.PBC_KEY: np.array([True] * 3),
                _keys.ATOM_TYPE_KEY: rng.randint(0, n_types, 12),
                _keys.ATOMIC_NUMBERS_KEY: np.full(12, 29),
            }
        )
        f2 = compute_neighborlist_(f2, r_max)
        data = _padded([frame, f2])
        n1 = frame[_keys.POSITIONS_KEY].shape[0]
        batch_vec = np.asarray(data[_keys.BATCH_KEY])

        def frame1_energy(pos):
            d = dict(data)
            d[_keys.POSITIONS_KEY] = pos
            return jnp.sum(model(params, d)[_keys.TOTAL_ENERGY_KEY][1])

        grads = np.asarray(
            jax.jit(jax.grad(frame1_energy))(data[_keys.POSITIONS_KEY])
        )
        in_frame = grads[batch_vec == 1]
        cross_frame = grads[batch_vec != 1]
        assert np.max(np.abs(cross_frame)) == 0.0, "cross-frame gradient leak"
        assert np.max(np.abs(in_frame)) > 0.0, "in-frame gradient vanished"
        assert in_frame.shape[0] >= 12 and cross_frame.shape[0] >= n1

    @pytest.fixture(scope="class")
    def partial_model(self, model_and_params):
        """PartialForceOutput wrapped around the same energy head (accepts
        the same params)."""
        from ...nn.grad_output import ForceStressOutput, PartialForceOutput

        model, params = model_and_params
        inner = getattr(model, "model", None)
        if not isinstance(inner, ForceStressOutput):
            pytest.skip("model is not ForceStressOutput-wrapped")
        return PartialForceOutput(inner.func), params

    def test_partial_forces(self, model_and_params, fwd, partial_model, frame):
        """Partial forces: shape (E_j vs pos_i) jacobian, summing to the
        total forces, with exact cross-frame sparsity (parity:
        ``model_tests_basic.py:674-721``)."""
        model, params = model_and_params
        pmodel, pparams = partial_model
        rng = np.random.RandomState(31)
        data = _padded([frame])
        out = fwd(params, data)
        out_partial = jax.jit(lambda p, d: pmodel(p, d))(pparams, data)

        # shared outputs agree
        np.testing.assert_allclose(
            np.asarray(out[_keys.PER_ATOM_ENERGY_KEY]),
            np.asarray(out_partial[_keys.PER_ATOM_ENERGY_KEY]),
            atol=1e-10,
        )
        n_cap = data[_keys.POSITIONS_KEY].shape[0]
        partial = np.asarray(out_partial[_keys.PARTIAL_FORCE_KEY])
        assert partial.shape == (n_cap, n_cap, 3)
        if _keys.FORCE_KEY in out:
            np.testing.assert_allclose(
                partial.sum(axis=0),
                np.asarray(out[_keys.FORCE_KEY]),
                atol=1e-9,
            )
        # cross-frame sparsity: dE_j/dpos_i == 0 when batch[j] != batch[i]
        batch_vec = np.asarray(data[_keys.BATCH_KEY])
        diff_frame = batch_vec[:, None] != batch_vec[None, :]
        assert np.all(partial[diff_frame] == 0.0)

    @pytest.fixture(scope="class")
    def pair_force(self, model_and_params, fwd, r_max):
        """forces (2, 3) for a two-atom open-boundary system of the given
        types at separation d (second atom padded out to box_len away)."""

        def _pair_force(t1: int, t2: int, d: float, box_len: float):
            f = from_dict(
                {
                    _keys.POSITIONS_KEY: np.array(
                        [[0.0, 0.0, 0.0], [d, 0.0, 0.0]]
                    ),
                    _keys.ATOM_TYPE_KEY: np.array([t1, t2]),
                    _keys.ATOMIC_NUMBERS_KEY: np.array([29, 1]),
                }
            )
            f = compute_neighborlist_(f, r_max)
            _, params = model_and_params
            out = fwd(params, _padded([f]))
            if _keys.FORCE_KEY not in out:
                pytest.skip("model has no force output")
            return np.asarray(out[_keys.FORCE_KEY][:2])

        return _pair_force

    def test_force_smoothness(self, model_config, pair_force, r_max, n_types):
        """Forces vanish exactly at and beyond the cutoff radius, and are
        nonzero inside it, for every type pair (locality + smooth-envelope
        gate; parity: ``model_tests_basic.py:810-843``)."""
        if model_config.get("per_edge_type_cutoff") is not None:
            pytest.skip("per-edge-type cutoffs: see test_per_edge_type_cutoff")
        for t1 in range(n_types):
            for t2 in range(n_types):
                forces = pair_force(t1, t2, 0.5 * r_max, 1.5 * r_max)
                assert np.abs(forces).sum() > 1e-4, (
                    f"zero force well inside cutoff for types ({t1},{t2})"
                )
                forces = pair_force(t1, t2, r_max, 1.5 * r_max)
                np.testing.assert_allclose(forces, 0.0, atol=1e-8)
                forces = pair_force(t1, t2, 1.1 * r_max, 1.5 * r_max)
                np.testing.assert_allclose(forces, 0.0, atol=1e-12)

    def test_embedding_cutoff(self, model_and_params, fwd, r_max):
        """Edge embeddings go to zero at the cutoff, and the energies of the
        remaining atoms are unaffected (zero gradient) by an atom sitting
        exactly at the cutoff (parity: ``model_tests_basic.py:959-1029``)."""
        model, params = model_and_params
        rng = np.random.RandomState(41)

        def three_atom(y2):
            f = from_dict(
                {
                    _keys.POSITIONS_KEY: np.array(
                        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, y2, 0.0]]
                    ),
                    _keys.ATOM_TYPE_KEY: np.array([0, 0, 0]),
                    _keys.ATOMIC_NUMBERS_KEY: np.array([29, 29, 29]),
                    # fixed edge set (including the 0<->2 pair even at the
                    # cutoff) so the envelope, not the neighborlist, is tested
                    _keys.EDGE_INDEX_KEY: np.array(
                        [[0, 1, 0, 2], [1, 0, 2, 0]], dtype=np.int32
                    ),
                }
            )
            return _padded([f], caps=(8, 8, 2))

        out_in = fwd(params, three_atom(0.5 * r_max))
        out_at = fwd(params, three_atom(r_max))
        if _keys.EDGE_EMBEDDING_KEY in out_in:
            emb_in = np.asarray(out_in[_keys.EDGE_EMBEDDING_KEY])
            emb_at = np.asarray(out_at[_keys.EDGE_EMBEDDING_KEY])
            # 0<->1 edges unaffected by moving atom 2
            np.testing.assert_allclose(emb_at[:2], emb_in[:2], atol=1e-10)
            # inside the cutoff, the 0<->2 embedding is nonzero...
            assert np.abs(emb_in[2:4]).sum() > 1e-6
            # ...and exactly zero at the cutoff
            np.testing.assert_allclose(emb_at[2:4], 0.0, atol=1e-12)

        # energies of atoms 0,1 have zero gradient wrt the at-cutoff atom 2
        data = three_atom(r_max)

        def e01(pos):
            d = dict(data)
            d[_keys.POSITIONS_KEY] = pos
            return jnp.sum(model(params, d)[_keys.PER_ATOM_ENERGY_KEY][:2])

        grads = np.asarray(jax.jit(jax.grad(e01))(data[_keys.POSITIONS_KEY]))
        np.testing.assert_allclose(grads[2], 0.0, atol=1e-10)
