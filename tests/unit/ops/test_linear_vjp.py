"""Hand-written VJPs for ``ops.Linear`` and ``InteractionBlock._merge_mid``.

Both replace XLA's slice-autodiff (full-width pad + add_any chains — the
dominant avoidable HBM traffic in the E+F backward, StableHLO census r3)
with structural inverse maps.  These tests pin them to plain autodiff in
f64: first-order grads, second-order (rr force-loss shape: grad of a
grad-dependent loss), and the merge permutation's self-inversion.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

import nequip_tpu.ops.linear as linear_mod
from nequip_tpu.ops.irreps import Irreps
from nequip_tpu.ops.linear import Linear


@pytest.fixture()
def lin_problem():
    irreps_in = Irreps("4x0e+3x1e+4x0e+2x2e")  # duplicated ir on purpose
    irreps_out = Irreps("5x0e+2x1e+3x2e+1x3e")  # 3e has no input: zero block
    lin = Linear(irreps_in, irreps_out)
    rng = np.random.RandomState(0)
    params = {
        k: jnp.asarray(rng.standard_normal(v.shape), jnp.float64)
        for k, v in lin.init(jax.random.PRNGKey(0)).items()
    }
    x = jnp.asarray(rng.standard_normal((7, irreps_in.dim)), jnp.float64)
    return lin, params, x


def test_linear_grads_match_autodiff(lin_problem, monkeypatch):
    lin, params, x = lin_problem

    def loss(p, xx):
        y = lin(p, xx)
        return jnp.sum(jnp.sin(y) * y)

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    monkeypatch.setattr(linear_mod, "CUSTOM_VJP", False)
    gp_ref, gx_ref = jax.grad(loss, argnums=(0, 1))(params, x)

    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-14)
    for k in gp_ref:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(gp_ref[k]), atol=1e-14, err_msg=k
        )


def test_linear_second_order_matches_autodiff(lin_problem, monkeypatch):
    """rr-shaped second order: loss of a gradient (forces are grads)."""
    lin, params, x = lin_problem

    def inner(p, xx):
        return jnp.sum(lin(p, xx) ** 2)

    def outer(p, xx):
        g = jax.grad(inner, argnums=1)(p, xx)
        return jnp.sum(jnp.cos(g) * g)

    gp = jax.grad(outer)(params, x)
    monkeypatch.setattr(linear_mod, "CUSTOM_VJP", False)
    gp_ref = jax.grad(outer)(params, x)
    for k in gp_ref:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(gp_ref[k]), atol=1e-13, err_msg=k
        )


def test_linear_batch_dims(lin_problem, monkeypatch):
    """Leading batch dims beyond one (e.g. [B, N, dim]) contract correctly."""
    lin, params, _ = lin_problem
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.standard_normal((2, 5, lin.irreps_in.dim)), jnp.float64)

    def loss(p, xx):
        return jnp.sum(lin(p, xx) ** 2)

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    monkeypatch.setattr(linear_mod, "CUSTOM_VJP", False)
    gp_ref, gx_ref = jax.grad(loss, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-14)
    for k in gp_ref:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(gp_ref[k]), atol=1e-14, err_msg=k
        )


@pytest.fixture()
def block():
    from nequip_tpu.data import _keys
    from nequip_tpu.nn.interaction_block import InteractionBlock

    irreps_in = {
        _keys.NODE_FEATURES_KEY: Irreps("4x0e+4x1e+4x2e"),
        _keys.NODE_ATTRS_KEY: Irreps("2x0e"),
        _keys.EDGE_ATTRS_KEY: Irreps.spherical_harmonics(2),
        _keys.EDGE_EMBEDDING_KEY: Irreps("4x0e"),
    }
    return InteractionBlock(
        irreps_in=irreps_in,
        irreps_out=Irreps("4x0e+4x1e+4x2e"),
        radial_mlp_depth=1,
        radial_mlp_width=8,
        avg_num_neighbors=10.0,
        tp_impl="xla",
    )


def test_merge_mid_roundtrip_and_vjp(block):
    assert block._mid_needs_merge, "test irreps must exercise the merge"
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.standard_normal((6, block.irreps_mid.dim)), jnp.float64)

    # permutation: unmerge(merge(x)) == x
    merged = block._merge_mid_impl(x)
    np.testing.assert_array_equal(np.asarray(block._unmerge_mid(merged)), np.asarray(x))

    def loss(xx):
        y = block._merge_mid(xx)
        return jnp.sum(jnp.sin(y) * y)

    def loss_ref(xx):
        y = block._merge_mid_impl(xx)
        return jnp.sum(jnp.sin(y) * y)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss)(x)), np.asarray(jax.grad(loss_ref)(x)), atol=0
    )
    # second order (rr): grad of a grad-dependent loss
    def outer(xx):
        g = jax.grad(lambda z: jnp.sum(block._merge_mid(z) ** 3))(xx)
        return jnp.sum(g * jnp.cos(g))

    def outer_ref(xx):
        g = jax.grad(lambda z: jnp.sum(block._merge_mid_impl(z) ** 3))(xx)
        return jnp.sum(g * jnp.cos(g))

    np.testing.assert_allclose(
        np.asarray(jax.grad(outer)(x)), np.asarray(jax.grad(outer_ref)(x)), atol=1e-13
    )
