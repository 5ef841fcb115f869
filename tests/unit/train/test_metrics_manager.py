"""MetricsManager semantics: coefficient normalization, per-type paths,
NaN masking, accumulation == batch math.

Parity: ``/root/reference/tests/unit/train/test_metrics_manager.py``.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nequip_tpu.data import _keys
from nequip_tpu.train import EnergyForceLoss, EnergyForceMetrics, MetricsManager


def make_data(n=6, f=2, seed=0, nan_stress=False):
    r = np.random.RandomState(seed)
    batch = np.repeat(np.arange(f), n // f)
    data = {
        _keys.POSITIONS_KEY: jnp.asarray(r.standard_normal((n, 3))),
        _keys.ATOM_TYPE_KEY: jnp.asarray(r.randint(0, 2, n)),
        _keys.BATCH_KEY: jnp.asarray(batch, dtype=jnp.int32),
        _keys.NUM_NODES_KEY: jnp.full(f, n // f, dtype=jnp.int32),
        _keys.TOTAL_ENERGY_KEY: jnp.asarray(r.standard_normal((f, 1))),
        _keys.FORCE_KEY: jnp.asarray(r.standard_normal((n, 3))),
        _keys.NODE_MASK_KEY: jnp.ones(n, dtype=bool),
        _keys.FRAME_MASK_KEY: jnp.ones(f, dtype=bool),
    }
    stress = r.standard_normal((f, 3, 3))
    if nan_stress:
        stress[0] = np.nan
    data[_keys.STRESS_KEY] = jnp.asarray(stress)
    return data


def test_coeff_normalization():
    mgr = EnergyForceLoss(
        coeffs={_keys.TOTAL_ENERGY_KEY: 3.0, _keys.FORCE_KEY: 1.0},
        type_names=["A", "B"],
    )
    assert mgr.coeffs["per_atom_energy_mse"] == pytest.approx(0.75)
    assert mgr.coeffs["forces_mse"] == pytest.approx(0.25)
    # runtime re-weighting
    mgr.set_coeffs({"per_atom_energy_mse": 1.0, "forces_mse": 4.0})
    assert mgr.coeffs["forces_mse"] == pytest.approx(0.8)


def test_loss_matches_manual_mse():
    mgr = EnergyForceLoss(type_names=["A", "B"])
    target = make_data(seed=1)
    pred = dict(target)
    r = np.random.RandomState(2)
    pred[_keys.TOTAL_ENERGY_KEY] = target[_keys.TOTAL_ENERGY_KEY] + 0.1
    pred[_keys.FORCE_KEY] = target[_keys.FORCE_KEY] + jnp.asarray(
        r.standard_normal((6, 3)) * 0.1
    )
    loss, values = mgr(pred, target)
    n_per_frame = 3
    e_err = 0.1 / n_per_frame
    manual_e_mse = e_err**2
    manual_f_mse = float(
        jnp.mean((pred[_keys.FORCE_KEY] - target[_keys.FORCE_KEY]) ** 2)
    )
    np.testing.assert_allclose(float(values["per_atom_energy_mse"]), manual_e_mse, rtol=1e-10)
    np.testing.assert_allclose(float(values["forces_mse"]), manual_f_mse, rtol=1e-10)
    np.testing.assert_allclose(float(loss), 0.5 * (manual_e_mse + manual_f_mse), rtol=1e-10)


def test_nan_target_masking():
    mgr = MetricsManager(
        [
            {
                "name": "stress_mae",
                "field": _keys.STRESS_KEY,
                "metric": "mae",
                "coeff": 1.0,
                "ignore_nan": True,
            }
        ]
    )
    target = make_data(seed=3, nan_stress=True)
    pred = dict(target)
    pred[_keys.STRESS_KEY] = target[_keys.STRESS_KEY] + 0.5
    loss, values = mgr(pred, target)
    # frame 0 stress is NaN and ignored; remaining errors are exactly 0.5
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(values["stress_mae"]), 0.5, rtol=1e-6)


def test_per_type_metrics():
    mgr = MetricsManager(
        [
            {
                "name": "forces_mae",
                "field": _keys.FORCE_KEY,
                "metric": "mae",
                "coeff": 1.0,
                "per_type": True,
            }
        ],
        type_names=["A", "B"],
    )
    target = make_data(seed=4)
    pred = dict(target)
    err = np.zeros((6, 3))
    types = np.asarray(target[_keys.ATOM_TYPE_KEY])
    err[types == 0] = 0.2
    err[types == 1] = 0.6
    pred[_keys.FORCE_KEY] = target[_keys.FORCE_KEY] + jnp.asarray(err)
    _, values = mgr(pred, target)
    np.testing.assert_allclose(float(values["forces_mae_A"]), 0.2, rtol=1e-6)
    np.testing.assert_allclose(float(values["forces_mae_B"]), 0.6, rtol=1e-6)
    # unweighted mean over present types
    np.testing.assert_allclose(float(values["forces_mae"]), 0.4, rtol=1e-6)


def test_epoch_accumulation_equals_single_batch():
    mgr = EnergyForceMetrics(type_names=["A", "B"])
    t1, t2 = make_data(seed=5), make_data(seed=6)
    p1, p2 = dict(t1), dict(t2)
    p1[_keys.FORCE_KEY] = t1[_keys.FORCE_KEY] + 0.3
    p2[_keys.FORCE_KEY] = t2[_keys.FORCE_KEY] - 0.1
    state = mgr.init_state()
    state = mgr.update_state(state, p1, t1)
    state = mgr.update_state(state, p2, t2)
    out = mgr.compute(state)
    # manual MAE over both batches
    manual = np.mean(
        np.abs(
            np.concatenate(
                [
                    np.asarray(p1[_keys.FORCE_KEY] - t1[_keys.FORCE_KEY]),
                    np.asarray(p2[_keys.FORCE_KEY] - t2[_keys.FORCE_KEY]),
                ]
            )
        )
    )
    np.testing.assert_allclose(out["forces_mae"], manual, rtol=1e-10)
