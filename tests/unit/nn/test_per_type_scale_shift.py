"""Per-type scale/shift VALUE assertions.

Parity: ``/root/reference/tests/unit/nn/test_atomic.py`` — out must equal
``shift[type] + scale[type] * in`` exactly for every combination of
scalar/per-type-dict scales and shifts, the trainable promotion must expand
scalars to per-type vectors, and ``modify_PerTypeScaleShift`` must install
the new values.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nequip_tpu.data import _keys
from nequip_tpu.nn.atomwise import PerTypeScaleShift
from nequip_tpu.ops.irreps import Irreps

TYPE_NAMES = ["A", "B", "C"]


def _apply(scales, shifts, scales_trainable=False, shifts_trainable=False):
    mod = PerTypeScaleShift(
        type_names=TYPE_NAMES,
        field=_keys.PER_ATOM_ENERGY_KEY,
        scales=scales,
        shifts=shifts,
        scales_trainable=scales_trainable,
        shifts_trainable=shifts_trainable,
        irreps_in={_keys.PER_ATOM_ENERGY_KEY: Irreps("1x0e")},
    )
    params = mod.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    x = rng.standard_normal((7, 1))
    types = rng.randint(0, 3, 7)
    out = mod(
        params,
        {
            _keys.PER_ATOM_ENERGY_KEY: jnp.asarray(x),
            _keys.ATOM_TYPE_KEY: jnp.asarray(types),
        },
    )[_keys.PER_ATOM_ENERGY_KEY]
    return mod, params, np.asarray(out), x, types


@pytest.mark.parametrize(
    "scales",
    [None, 1.3, {"A": 1.3, "B": 9.3, "C": 4.1}],
    ids=["s-none", "s-scalar", "s-dict"],
)
@pytest.mark.parametrize(
    "shifts",
    [None, 5.7, {"A": 5.7, "B": 77.7, "C": 34.1}],
    ids=["t-none", "t-scalar", "t-dict"],
)
def test_values(scales, shifts):
    _, _, out, x, types = _apply(scales, shifts)

    def per_type(v):
        if v is None:
            return np.ones(3) if v is scales else np.zeros(3)
        if isinstance(v, dict):
            return np.array([v[t] for t in TYPE_NAMES])
        return np.full(3, float(v))

    s = per_type(scales) if scales is not None else np.ones(3)
    t = per_type(shifts) if shifts is not None else np.zeros(3)
    expected = t[types][:, None] + s[types][:, None] * x
    np.testing.assert_allclose(out, expected, rtol=1e-14, atol=1e-14)


def test_trainable_promotion_and_freezing():
    # scalar + trainable promotes to a per-type vector parameter
    mod, params, _, _, _ = _apply(1.5, 0.25, scales_trainable=True)
    assert params["scales"].shape == (3, 1)
    assert params["shifts"].shape == (1, 1)  # non-trainable scalar stays scalar
    assert mod.frozen_param_paths() == {"shifts"}

    mod, params, _, _, _ = _apply(1.5, 0.25)
    assert mod.frozen_param_paths() == {"scales", "shifts"}


def test_modify_per_type_scale_shift():
    """The fine-tuning modifier must install new values (reference:
    ``test_atomic.py:92-130``, ``nn/atomwise.py:286-353``)."""
    from nequip_tpu.model import NequIPGNNModel
    from nequip_tpu.model.modify_utils import modify

    model = NequIPGNNModel(
        seed=5,
        model_dtype="float64",
        type_names=["A", "B"],
        r_max=4.0,
        num_layers=1,
        l_max=1,
        parity=False,
        num_features=4,
        radial_mlp_width=8,
        avg_num_neighbors=8.0,
        per_type_energy_shifts={"A": -1.0, "B": -2.0},
        per_type_energy_scales={"A": 1.0, "B": 1.0},
    )
    params = model.init_params()
    new_model, new_params = modify(
        model,
        params,
        [
            {
                "modifier": "modify_PerTypeScaleShift",
                "shifts": {"A": -10.0, "B": -20.0},
                "scales": {"A": 2.0, "B": 3.0},
                "shifts_trainable": True,
            }
        ],
    )
    # locate the scale/shift module's params and check values
    found = False

    def _find(node):
        nonlocal found
        if isinstance(node, dict):
            if "scales" in node and "shifts" in node:
                np.testing.assert_allclose(
                    np.asarray(node["scales"]).reshape(-1), [2.0, 3.0]
                )
                np.testing.assert_allclose(
                    np.asarray(node["shifts"]).reshape(-1), [-10.0, -20.0]
                )
                found = True
            for v in node.values():
                _find(v)

    _find(jax.device_get(new_params))
    assert found
    # trainable shifts are no longer frozen
    frozen = new_model.frozen_param_paths()
    assert not any(p.endswith("shifts") for p in frozen)
    assert any(p.endswith("scales") for p in frozen)
