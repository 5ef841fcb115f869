"""Config system, resolvers, layout converters, modifiers."""

import numpy as np
import pytest

from nequip_tpu.utils.config import instantiate, load_config, register_resolver, resolve


def test_interpolation_and_resolvers():
    cfg = {
        "a": 6,
        "b": "${int_div:${a},2}",
        "c": "${int_mul:${a},2}",
        "lst": ["x", "y"],
        "d": "${list_to_constant_dict:${lst},1.5}",
        "nested": {"e": "${a}"},
    }
    out = resolve(cfg)
    assert out["b"] == 3 and out["c"] == 12
    assert out["d"] == {"x": 1.5, "y": 1.5}
    assert out["nested"]["e"] == 6


def test_unknown_resolver_left_verbatim():
    from nequip_tpu.utils.config import _RESOLVERS

    saved = _RESOLVERS.pop("training_data_stats", None)
    try:
        cfg = {"x": "${training_data_stats:num_neighbors_mean}"}
        out = resolve(cfg)
        assert out["x"] == cfg["x"]
        register_resolver("training_data_stats", lambda name: 42.0, replace=True)
        assert resolve(cfg)["x"] == 42.0
    finally:
        if saved is not None:
            _RESOLVERS["training_data_stats"] = saved
        else:
            _RESOLVERS.pop("training_data_stats", None)


def test_big_dataset_stats_resolver():
    cfg = {"v": "${big_dataset_stats:MPTrj,5.0,num_neighbors_mean}"}
    assert resolve(cfg)["v"] == 36.0116
    with pytest.raises(KeyError):
        resolve({"v": "${big_dataset_stats:does_not_exist,5.0,x}"})


def test_instantiate_partial_and_nested():
    cfg = {
        "_target_": "nequip_tpu.data.transforms.ChemicalSpeciesToAtomTypeMapper",
        "chemical_symbols": ["C", "H"],
    }
    mapper = instantiate(cfg)
    assert mapper.chemical_symbols == ["C", "H"]


def test_layout_converters_roundtrip():
    from nequip_tpu.ops import Irreps
    from nequip_tpu.ops.layout import ir_mul_to_mul_ir, mul_ir_to_ir_mul

    irreps = Irreps("4x0e+3x1o+2x2e")
    r = np.random.RandomState(0)
    x = r.standard_normal((5, irreps.dim))
    np.testing.assert_allclose(
        ir_mul_to_mul_ir(mul_ir_to_ir_mul(x, irreps), irreps), x
    )
    # spot-check the semantics: e3nn chunk (mul, m) flattened -> (m, mul)
    y = mul_ir_to_ir_mul(x, irreps)
    chunk = x[:, 4 : 4 + 9].reshape(5, 3, 3)  # 3x1o as (mul, m)
    np.testing.assert_allclose(
        y[:, 4 : 4 + 9].reshape(5, 3, 3), chunk.swapaxes(-1, -2)
    )


def test_tutorial_config_loads():
    cfg = load_config("configs/tutorial.yaml")
    for section in ("run", "data", "trainer", "training_module"):
        assert section in cfg
    out = resolve(cfg)
    assert out["training_module"]["model"]["radial_mlp_width"] == 64


def test_big_dataset_stats_shipped_tables():
    """MPTrj/MatPES/OMat precomputed stats resolve at every shipped cutoff.

    Parity: ``/root/reference/nequip/data/dataset_stats/*.yaml`` +
    ``utils/resolvers.py:81-104``.
    """
    from nequip_tpu.utils.config import resolve

    for ds in ("MPTrj", "MatPES", "OMat"):
        cfg = resolve(
            {
                "nn": f"${{big_dataset_stats:{ds},5.0,num_neighbors_mean}}",
                "pt": f"${{big_dataset_stats:{ds},6.0,per_type_num_neighbors_mean}}",
                "iso": f"${{big_dataset_stats:{ds},5.0,isolated_atom_energies}}",
                "frms": f"${{big_dataset_stats:{ds},4.5,forces_rms}}",
            }
        )
        assert cfg["nn"] > 1.0
        assert isinstance(cfg["pt"], dict) and cfg["pt"]["Cu"] > 1.0
        assert cfg["iso"]["H"] < 0.0
        assert cfg["frms"] > 0.0
