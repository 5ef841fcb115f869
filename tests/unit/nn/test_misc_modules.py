"""AtomwiseOperation, AppendVectorFieldEmbed, Concat/SaveForOutput, model cache."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nequip_tpu.data import _keys, register_fields
from nequip_tpu.ops import Irreps


def test_atomwise_operation():
    from nequip_tpu.nn import AtomwiseOperation
    from nequip_tpu.ops.gate import NormActivation

    irreps = Irreps("4x1o")
    op = NormActivation(irreps)
    mod = AtomwiseOperation(op, _keys.NODE_FEATURES_KEY,
                            irreps_in={_keys.NODE_FEATURES_KEY: irreps})
    x = jnp.asarray(np.random.RandomState(0).standard_normal((5, irreps.dim)))
    out = mod({}, {_keys.NODE_FEATURES_KEY: x})
    assert out[_keys.NODE_FEATURES_KEY].shape == x.shape


def test_append_vector_field_embed_equivariance():
    from nequip_tpu.nn.embedding import AppendVectorFieldEmbed
    from nequip_tpu.ops import random_rotation
    from nequip_tpu.ops.cg import wigner_D

    register_fields(node_fields=["spin_vec"])
    mod = AppendVectorFieldEmbed(
        field="spin_vec", lmax=1, axial=False,
        irreps_in={_keys.NODE_FEATURES_KEY: Irreps("4x0e")},
    )
    assert mod.irreps_out[_keys.NODE_FEATURES_KEY] == Irreps("4x0e") + Irreps("1x0e+1x1o")
    r = np.random.RandomState(1)
    feats = jnp.asarray(r.standard_normal((6, 4)))
    vec = r.standard_normal((6, 3))
    out = np.asarray(
        mod({}, {_keys.NODE_FEATURES_KEY: feats, "spin_vec": jnp.asarray(vec)})[
            _keys.NODE_FEATURES_KEY
        ]
    )
    R = random_rotation(r)
    out_r = np.asarray(
        mod({}, {_keys.NODE_FEATURES_KEY: feats, "spin_vec": jnp.asarray(vec @ R.T)})[
            _keys.NODE_FEATURES_KEY
        ]
    )
    # scalar channels invariant, vector channel rotates with D1
    np.testing.assert_allclose(out_r[:, :5], out[:, :5], atol=1e-6)  # f32 model_dtype
    D1 = wigner_D(1, R)
    np.testing.assert_allclose(out_r[:, 5:8], out[:, 5:8] @ D1.T, atol=1e-6)


def test_model_cache_resolution(tmp_path, monkeypatch):
    from nequip_tpu.utils.model_cache import model_id_to_path, resolve_model_id

    monkeypatch.setenv("NEQUIP_CACHE_DIR", str(tmp_path))
    path = model_id_to_path("nequip.net:mir-group/foo:0.1")
    assert path.startswith(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        resolve_model_id("nequip.net:mir-group/foo:0.1")
    open(path, "wb").write(b"x")
    assert resolve_model_id("nequip.net:mir-group/foo:0.1") == path
