import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nequip_tpu.ops import (
    spherical_harmonics,
    spherical_harmonics_np,
    wigner_D,
    random_rotation,
    sh_dim,
)

LMAX = 4


def test_component_normalization():
    """sum_m Y_lm(u)^2 == 2l+1 for unit u (component normalization)."""
    v = np.random.RandomState(0).standard_normal((32, 3))
    Y = spherical_harmonics_np(LMAX, v)
    for l in range(LMAX + 1):
        block = Y[:, l * l : (l + 1) * (l + 1)]
        np.testing.assert_allclose((block**2).sum(-1), 2 * l + 1, atol=1e-11)


def test_l1_is_yzx():
    u = np.array([[0.3, -0.5, 0.81]])
    u = u / np.linalg.norm(u)
    Y = spherical_harmonics_np(1, u)
    np.testing.assert_allclose(Y[0, 1:4], np.sqrt(3) * u[0][[1, 2, 0]], atol=1e-12)


def test_jax_matches_numpy():
    v = np.random.RandomState(1).standard_normal((16, 3))
    Yj = np.asarray(spherical_harmonics(LMAX, jnp.asarray(v)))
    Yn = spherical_harmonics_np(LMAX, v)
    np.testing.assert_allclose(Yj, Yn, atol=1e-12)


def test_equivariance():
    """Y(Rv) == D(R) Y(v) for every l block."""
    r = np.random.RandomState(2)
    v = r.standard_normal((8, 3))
    R = random_rotation(r)
    Y1 = spherical_harmonics_np(LMAX, v @ R.T)
    Y0 = spherical_harmonics_np(LMAX, v)
    for l in range(LMAX + 1):
        D = wigner_D(l, R)
        lhs = Y1[:, l * l : (l + 1) * (l + 1)]
        rhs = Y0[:, l * l : (l + 1) * (l + 1)] @ D.T
        np.testing.assert_allclose(lhs, rhs, atol=1e-10)


def test_zero_vector_safe():
    """Padded (zero) edge vectors must give finite values and finite grads."""
    v = jnp.zeros((4, 3))
    Y = spherical_harmonics(2, v)
    assert jnp.all(jnp.isfinite(Y))

    def f(v):
        return jnp.sum(spherical_harmonics(2, v) ** 2)

    g = jax.grad(f)(jnp.zeros((4, 3)))
    assert jnp.all(jnp.isfinite(g))


def test_sh_dim():
    assert sh_dim(3) == 16
