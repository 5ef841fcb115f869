"""Scalar-MLP parametrization gates (weight/spectral/orthogonal norms)."""

import numpy as np


class TestParametrizations:
    """Functional analogs of torch's weight reparametrizations
    (``/root/reference/nequip/nn/mlp.py:163-180``)."""

    def _mlp(self, parametrization, **kw):
        from nequip_tpu.ops.mlp import ScalarMLP

        return ScalarMLP(
            input_dim=16,
            output_dim=8,
            hidden_layers_depth=1,
            hidden_layers_width=12,
            parametrization=parametrization,
            **kw,
        )

    def test_weight_norm_init_is_identity(self):
        import jax
        import jax.numpy as jnp

        plain = self._mlp(None)
        wn = self._mlp("weight_norm")
        rng = jax.random.PRNGKey(0)
        p_plain, p_wn = plain.init(rng), wn.init(rng)
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 16))
        # g is initialized to the row norms, so initial outputs match exactly
        np.testing.assert_allclose(
            np.asarray(wn(p_wn, x)), np.asarray(plain(p_plain, x)), rtol=1e-9, atol=1e-11
        )
        # scaling a row of v leaves the effective weight invariant
        p2 = dict(p_wn)
        p2["w0"] = p_wn["w0"].at[3].mul(7.5)
        np.testing.assert_allclose(
            np.asarray(wn(p2, x)), np.asarray(wn(p_wn, x)), rtol=1e-10
        )

    def test_spectral_norm_unit_sigma(self):
        import jax

        sn = self._mlp("spectral_norm")
        p = sn.init(jax.random.PRNGKey(2))
        w_eff = np.asarray(sn._parametrized(p, 0, np.float64))
        s = np.linalg.svd(w_eff, compute_uv=False)
        np.testing.assert_allclose(s[0], 1.0, rtol=1e-6)

    def test_orthogonal(self):
        import jax

        om = self._mlp("orthogonal")
        p = om.init(jax.random.PRNGKey(3))
        for layer, shape in enumerate([(16, 12), (12, 8)]):
            w = np.asarray(om._parametrized(p, layer, np.float64))
            assert w.shape == shape
            gram = w.T @ w if shape[0] >= shape[1] else w @ w.T
            np.testing.assert_allclose(gram, np.eye(gram.shape[0]), atol=1e-6)

    def test_gradients_flow(self):
        import jax
        import jax.numpy as jnp

        for p_name in ("weight_norm", "spectral_norm", "orthogonal"):
            m = self._mlp(p_name)
            p = m.init(jax.random.PRNGKey(4))
            x = jax.random.normal(jax.random.PRNGKey(5), (4, 16))
            g = jax.grad(lambda pp: jnp.sum(m(pp, x) ** 2))(p)
            assert all(
                np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(g)
            )
            assert any(
                np.abs(np.asarray(l)).max() > 0 for l in jax.tree.leaves(g)
            )
