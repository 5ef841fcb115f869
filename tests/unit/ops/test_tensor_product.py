import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nequip_tpu.ops import (
    Irreps,
    Linear,
    Gate,
    NormActivation,
    TensorProduct,
    fully_connected_tensor_product,
    uvu_instructions,
    irrep_D,
    random_rotation,
)
from nequip_tpu.ops.cg import _rotation_from_quaternion


def rep_matrix(irreps: Irreps, R: np.ndarray) -> np.ndarray:
    """Block-diagonal O(3) rep matrix on a flat ir_mul feature vector."""
    blocks = []
    for mi in irreps:
        D = irrep_D(mi.ir.l, mi.ir.p, R)
        # chunk layout (2l+1, mul): rep acts on the m index
        blocks.append(np.kron(D, np.eye(mi.mul)))
    out = np.zeros((irreps.dim, irreps.dim))
    off = 0
    for b in blocks:
        n = b.shape[0]
        out[off : off + n, off : off + n] = b
        off += n
    return out


def transform(x: np.ndarray, irreps: Irreps, R: np.ndarray) -> np.ndarray:
    return x @ rep_matrix(irreps, R).T


@pytest.mark.parametrize("improper", [False, True])
def test_uvu_tp_equivariance(improper):
    r = np.random.RandomState(0)
    irreps1 = Irreps("8x0e+4x1o+2x2e")
    irreps2 = Irreps.spherical_harmonics(2)
    target = Irreps("8x0e+4x1o+4x1e+2x2e")
    mid, ins = uvu_instructions(irreps1, irreps2, target)
    tp = TensorProduct(irreps1, irreps2, mid, ins)

    E = 10
    x1 = r.standard_normal((E, irreps1.dim))
    x2 = r.standard_normal((E, irreps2.dim))
    w = r.standard_normal((E, tp.weight_numel))

    R = random_rotation(r)
    if improper:
        R = -R  # inversion x rotation

    out = np.asarray(tp(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(w)))
    out_rot = np.asarray(
        tp(
            jnp.asarray(transform(x1, irreps1, R)),
            jnp.asarray(transform(x2, irreps2, R)),
            jnp.asarray(w),
        )
    )
    np.testing.assert_allclose(out_rot, transform(out, mid, R), atol=1e-10)


def test_fctp_equivariance():
    r = np.random.RandomState(1)
    irreps1 = Irreps("4x0e+3x1o")
    irreps2 = Irreps("5x0e")
    irreps_out = Irreps("6x0e+2x1o")
    tp = fully_connected_tensor_product(irreps1, irreps2, irreps_out)
    w = np.asarray(tp.init_weights(jax.random.PRNGKey(0)))

    x1 = r.standard_normal((7, irreps1.dim))
    x2 = r.standard_normal((7, irreps2.dim))
    R = random_rotation(r)

    out = np.asarray(tp(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(w)))
    out_rot = np.asarray(
        tp(
            jnp.asarray(transform(x1, irreps1, R)),
            jnp.asarray(transform(x2, irreps2, R)),
            jnp.asarray(w),
        )
    )
    np.testing.assert_allclose(out_rot, transform(out, irreps_out, R), atol=1e-10)


def test_linear_equivariance_and_variance():
    r = np.random.RandomState(2)
    irreps_in = Irreps("16x0e+8x1o+4x2e")
    irreps_out = Irreps("8x0e+8x1o+4x2e")
    lin = Linear(irreps_in, irreps_out)
    params = lin.init(jax.random.PRNGKey(0))

    x = r.standard_normal((64, irreps_in.dim))
    R = random_rotation(r)
    out = np.asarray(lin(params, jnp.asarray(x)))
    out_rot = np.asarray(lin(params, jnp.asarray(transform(x, irreps_in, R))))
    np.testing.assert_allclose(out_rot, transform(out, irreps_out, R), atol=1e-10)

    # variance preservation (loose statistical check)
    big = np.asarray(lin(params, jnp.asarray(r.standard_normal((4096, irreps_in.dim)))))
    assert 0.5 < big.var() < 2.0


def test_gate_equivariance():
    r = np.random.RandomState(3)
    irreps_scalars = Irreps("8x0e")
    irreps_gates = Irreps("6x0e")
    irreps_gated = Irreps("4x1o+2x2e")
    g = Gate(irreps_scalars, ["silu"], irreps_gates, ["silu"], irreps_gated)
    assert g.irreps_out == (irreps_scalars + irreps_gated).simplify()

    x = r.standard_normal((5, g.irreps_in.dim))
    R = random_rotation(r)
    out = np.asarray(g(jnp.asarray(x)))
    out_rot = np.asarray(g(jnp.asarray(transform(x, g.irreps_in, R))))
    np.testing.assert_allclose(out_rot, transform(out, g.irreps_out, R), atol=1e-10)


def test_norm_activation_equivariance():
    r = np.random.RandomState(4)
    irreps = Irreps("4x1o+2x2e")
    na = NormActivation(irreps)
    x = r.standard_normal((5, irreps.dim))
    R = random_rotation(r)
    out = np.asarray(na(jnp.asarray(x)))
    out_rot = np.asarray(na(jnp.asarray(transform(x, irreps, R))))
    np.testing.assert_allclose(out_rot, transform(out, irreps, R), atol=1e-10)


def test_tp_variance():
    """Component-normalized TP of unit-variance inputs keeps variance ~1."""
    r = np.random.RandomState(5)
    irreps1 = Irreps("64x0e+64x1o")
    irreps2 = Irreps.spherical_harmonics(1)
    target = Irreps("64x0e+64x1o+64x1e+64x2e")
    mid, ins = uvu_instructions(irreps1, irreps2, target)
    tp = TensorProduct(irreps1, irreps2, mid, ins)

    E = 2048
    x1 = r.standard_normal((E, irreps1.dim))
    # component-normalized SH-like input
    from nequip_tpu.ops import spherical_harmonics_np

    x2 = spherical_harmonics_np(1, r.standard_normal((E, 3)))
    w = r.standard_normal((E, tp.weight_numel))
    out = np.asarray(tp(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(w)))
    assert 0.3 < out.var() < 3.0, out.var()


def test_irreps_parsing_and_sort():
    ir = Irreps("32x0e+16x1o")
    assert ir.dim == 32 + 48
    assert ir.num_irreps == 48
    s, perm, inv = Irreps("1x1o+2x0e").sort()
    assert repr(s) == "2x0e+1x1o"
    assert perm == [1, 0]
    assert Irreps("4x0e+4x0e+2x1o").simplify() == Irreps("8x0e+2x1o")
