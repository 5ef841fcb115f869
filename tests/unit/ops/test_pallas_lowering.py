"""Cross-platform Mosaic lowering gate for the fused kernels.

``jax.export.export(..., platforms=["tpu"])`` runs the full Pallas→Mosaic
lowering (including the MLIR verifier) client-side, so TPU kernel-lowering
bugs are caught on CPU CI without a chip.  Regression: jax.nn.sigmoid's
bf16 lowering materializes f32 scalar constants that tripped
``vector.broadcast`` verification in the MLP backward (fixed by computing
the activation math in f32 inside the kernel).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import nequip_tpu.ops.pallas.tp_scatter as K
from nequip_tpu.ops import Irreps, TensorProduct, uvu_instructions
from nequip_tpu.ops.mlp import ScalarMLP


@pytest.fixture(scope="module")
def problem():
    feats = Irreps("8x0e+8x1e+8x2e")
    sh = Irreps.spherical_harmonics(2)
    mid, ins = uvu_instructions(feats, sh, feats)
    tp = TensorProduct(feats, sh, mid, ins, shared_weights=False)
    mlp = ScalarMLP(
        8, tp.weight_numel, hidden_layers_depth=1, hidden_layers_width=16,
        bias=False, nonlinearity="silu",
    )
    r = np.random.RandomState(0)
    N, E = 128, 512
    dst = jnp.asarray(np.sort(r.randint(0, N, E)), jnp.int32)
    src = jnp.asarray(r.randint(0, N, E), jnp.int32)
    mask = jnp.ones((E,), bool)
    return tp, mlp, N, E, dst, src, mask, r


@pytest.fixture()
def force_mosaic(monkeypatch):
    """Disable interpret mode so export runs the real TPU lowering."""
    orig = K.pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = False
        return orig(*a, **kw)

    monkeypatch.setattr(K.pl, "pallas_call", patched)


@pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16])
def test_tpu_lowering_all_orders(problem, force_mosaic, dt):
    tp, mlp, N, E, dst, src, mask, r = problem
    x = jnp.asarray(r.standard_normal((N, tp.irreps_in1.dim)), dt)
    y = jnp.asarray(r.standard_normal((E, tp.irreps_in2.dim)), dt)
    emb = jnp.asarray(r.standard_normal((E, 8)), dt)
    params = {
        k: jnp.asarray(np.asarray(v, np.float32), dt)
        for k, v in mlp.init(jax.random.PRNGKey(0)).items()
    }
    w = jnp.asarray(r.standard_normal((E, tp.weight_numel)), dt)

    def f_mlp(x, y, emb, w0, w1):
        return K.fused_tp_scatter_mlp(
            tp, mlp, x, y, emb, {"w0": w0, "w1": w1}, dst, src, mask, N
        )

    def g_mlp(x, y, emb, w0, w1):
        out, pull = jax.vjp(f_mlp, x, y, emb, w0, w1)
        return pull(jnp.ones_like(out))

    def f(x, y, w):
        return K.fused_tp_scatter(tp, x, y, w, dst, src, mask, N)

    def g(x, y, w):
        out, pull = jax.vjp(f, x, y, w)
        return pull(jnp.ones_like(out))

    def g2(x, y, w):  # reverse-over-reverse (force-loss training)
        def inner(xx):
            out, pull = jax.vjp(f, xx, y, w)
            return sum(
                jnp.sum(t.astype(jnp.float32) ** 2) for t in pull(jnp.ones_like(out))
            )

        return jax.grad(inner)(x)

    def g2_mlp(x, y, emb, w0, w1):  # force-loss training on the fused path
        def inner(yy):
            out, pull = jax.vjp(lambda q: f_mlp(x, q, emb, w0, w1), yy)
            (fy,) = pull(jnp.ones_like(out))
            return jnp.sum(fy.astype(jnp.float32) ** 2)

        return jax.grad(inner)(y)

    jax.export.export(jax.jit(f_mlp), platforms=["tpu"])(
        x, y, emb, params["w0"], params["w1"]
    )
    jax.export.export(jax.jit(g_mlp), platforms=["tpu"])(
        x, y, emb, params["w0"], params["w1"]
    )
    jax.export.export(jax.jit(g2_mlp), platforms=["tpu"])(
        x, y, emb, params["w0"], params["w1"]
    )
    jax.export.export(jax.jit(f), platforms=["tpu"])(x, y, w)
    jax.export.export(jax.jit(g), platforms=["tpu"])(x, y, w)
    jax.export.export(jax.jit(g2), platforms=["tpu"])(x, y, w)


def test_tpu_lowering_production_dims(force_mosaic):
    """Same gate at the flagship dims (mul=32, l_max=2, BLOCK_E-sized edge
    count): size-dependent Mosaic lowering failures (transposes, sublane
    tilings) would not reproduce at mul=8."""
    feats = Irreps("32x0e+32x1e+32x2e")
    sh = Irreps.spherical_harmonics(2)
    mid, ins = uvu_instructions(feats, sh, feats)
    tp = TensorProduct(feats, sh, mid, ins, shared_weights=False)
    mlp = ScalarMLP(
        8, tp.weight_numel, hidden_layers_depth=1, hidden_layers_width=64,
        bias=False, nonlinearity="silu",
    )
    r = np.random.RandomState(0)
    N, E = 128, 512
    dst = jnp.asarray(np.sort(r.randint(0, N, E)), jnp.int32)
    src = jnp.asarray(r.randint(0, N, E), jnp.int32)
    mask = jnp.ones((E,), bool)
    dt = jnp.float32
    x = jnp.asarray(r.standard_normal((N, tp.irreps_in1.dim)), dt)
    y = jnp.asarray(r.standard_normal((E, tp.irreps_in2.dim)), dt)
    emb = jnp.asarray(r.standard_normal((E, 8)), dt)
    params = mlp.init(jax.random.PRNGKey(0))

    def f_mlp(x, y, emb, w0, w1):
        return K.fused_tp_scatter_mlp(
            tp, mlp, x, y, emb, {"w0": w0, "w1": w1}, dst, src, mask, N
        )

    def g_mlp(x, y, emb, w0, w1):
        out, pull = jax.vjp(f_mlp, x, y, emb, w0, w1)
        return pull(jnp.ones_like(out))

    jax.export.export(jax.jit(f_mlp), platforms=["tpu"])(
        x, y, emb, params["w0"], params["w1"]
    )
    jax.export.export(jax.jit(g_mlp), platforms=["tpu"])(
        x, y, emb, params["w0"], params["w1"]
    )
