"""e3nn checkpoint importer gates.

True cross-framework parity needs torch+e3nn (absent in this image); what is
verifiable here, per the documented layout contract
(``model/e3nn_import.py``), is that the import is the exact inverse of the
reference-schema export: round-tripping a model's parameters through the
e3nn state-dict layout reproduces identical parameters and outputs, and the
layout transforms (flat-Linear splitting, MLP transposes, scale/shift
reshapes, wrapper-prefix stripping) are exercised on a real architecture.
"""

import numpy as np
import jax
import pytest

from nequip_tpu.data import (
    _keys,
    batched_from_list,
    compute_neighborlist_,
    from_dict,
    pad_batch,
    to_device,
)
from nequip_tpu.model import NequIPGNNModel
from nequip_tpu.model.e3nn_import import export_to_e3nn_npz, import_e3nn_npz


@pytest.fixture(scope="module")
def model_params():
    model = NequIPGNNModel(
        seed=42,
        model_dtype="float64",
        type_names=["Cu", "H"],
        r_max=4.0,
        num_layers=2,
        l_max=2,
        parity=True,
        num_features=4,
        radial_mlp_width=8,
        avg_num_neighbors=10.0,
        per_type_energy_shifts={"Cu": -3.0, "H": -1.0},
        per_type_energy_scales={"Cu": 0.5, "H": 0.7},
        bessel_trainable=True,
    )
    return model, model.init_params()


def _probe(model, params):
    rng = np.random.RandomState(0)
    f = from_dict(
        {
            _keys.POSITIONS_KEY: rng.uniform(0, 6.0, (12, 3)),
            _keys.CELL_KEY: np.diag([6.0] * 3),
            _keys.PBC_KEY: np.array([True] * 3),
            _keys.ATOM_TYPE_KEY: rng.randint(0, 2, 12),
        }
    )
    f = compute_neighborlist_(f, 4.0)
    data = to_device(pad_batch(batched_from_list([f]), 16, 512, 2))
    out = jax.jit(lambda p, d: model(p, d))(params, data)
    return np.asarray(out[_keys.TOTAL_ENERGY_KEY][0, 0]), np.asarray(
        out[_keys.FORCE_KEY][:12]
    )


def test_roundtrip_exact(model_params, tmp_path):
    model, params = model_params
    npz = str(tmp_path / "ref_weights.npz")
    exported = export_to_e3nn_npz(model, params, npz)
    # exported names follow the reference state-dict schema
    assert "layer0_convnet.conv.linear_1.weight" in exported
    assert exported["layer0_convnet.conv.linear_1.weight"].ndim == 1  # e3nn flat
    assert "per_atom_energy_readout.mlp.0.weight" in exported or any(
        k.startswith("per_atom_energy_readout.mlp.") for k in exported
    )
    assert "per_type_energy_scale_shift.shifts" in exported
    assert "type_embed.embed_module.weight" in exported
    assert "bessel_encode.bessel_weights" in exported

    imported = import_e3nn_npz(npz, model)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(jax.device_get(imported))[0],
        jax.tree_util.tree_flatten_with_path(jax.device_get(params))[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    e0, f0 = _probe(model, params)
    e1, f1 = _probe(model, imported)
    np.testing.assert_allclose(e1, e0, rtol=0)
    np.testing.assert_allclose(f1, f0, rtol=0)


def test_wrapper_prefix_stripping(model_params):
    """state_dicts exported from the wrapped torch GraphModel carry a
    'model.func.' prefix — the importer must strip it."""
    model, params = model_params
    exported = export_to_e3nn_npz(model, params)
    prefixed = {f"model.func.{k}": v for k, v in exported.items()}
    imported = import_e3nn_npz(prefixed, model)
    for a, b in zip(jax.tree.leaves(imported), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_missing_key_error_is_actionable(model_params):
    model, params = model_params
    exported = export_to_e3nn_npz(model, params)
    exported.pop("layer0_convnet.conv.linear_1.weight")
    with pytest.raises(KeyError, match="architecture"):
        import_e3nn_npz(exported, model)


def test_shape_drift_fails_loudly(model_params):
    model, params = model_params
    exported = export_to_e3nn_npz(model, params)
    w = exported["layer0_convnet.conv.linear_1.weight"]
    exported["layer0_convnet.conv.linear_1.weight"] = np.concatenate([w, w])
    with pytest.raises(AssertionError, match="numel mismatch"):
        import_e3nn_npz(exported, model)
