"""Parity gate for the fused Pallas gather-TP-scatter kernel.

Analog of the reference's kernel parity tests
(``/root/reference/tests/unit/nn/test_tp_scatter_kernel.py``): the fused
kernel must match the XLA reference path to numerical tolerance, including
gradients (which route through the custom VJP) and padded-edge masking.

Runs in Pallas interpret mode on CPU; the same code compiles with Mosaic on
real TPUs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nequip_tpu.ops import Irreps, TensorProduct, uvu_instructions
from nequip_tpu.ops.pallas.tp_scatter import fused_tp_scatter, _reference


@pytest.fixture(scope="module")
def setup():
    r = np.random.RandomState(0)
    feats = Irreps("8x0e+8x1o+8x2e")
    sh = Irreps.spherical_harmonics(2)
    target = feats + Irreps("8x1e+8x2o")
    mid, ins = uvu_instructions(feats, sh, target)
    tp = TensorProduct(feats, sh, mid, ins)

    N = 128  # one tile
    E = 300
    E_cap = 512
    x = jnp.asarray(r.standard_normal((N, feats.dim)))
    # dst-sorted edges like the neighborlist produces
    dst = np.sort(r.randint(0, 100, E))
    src = r.randint(0, 100, E)
    edge_dst = jnp.asarray(
        np.concatenate([dst, np.full(E_cap - E, N - 1)]), dtype=jnp.int32
    )
    edge_src = jnp.asarray(
        np.concatenate([src, np.full(E_cap - E, N - 1)]), dtype=jnp.int32
    )
    mask = jnp.asarray(np.arange(E_cap) < E)
    y = jnp.asarray(r.standard_normal((E_cap, sh.dim)))
    w = jnp.asarray(r.standard_normal((E_cap, tp.weight_numel)))
    return tp, x, y, w, edge_dst, edge_src, mask, N


def test_forward_parity(setup):
    tp, x, y, w, dst, src, mask, N = setup
    ref = _reference(tp, x, y, w, dst, src, mask, N)
    out = fused_tp_scatter(tp, x, y, w, dst, src, mask, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)


def test_forward_parity_unsorted(setup):
    """The kernel sorts internally, so unsorted edge lists must also work."""
    tp, x, y, w, dst, src, mask, N = setup
    r = np.random.RandomState(1)
    perm = r.permutation(dst.shape[0])
    dst2, src2 = dst[perm], src[perm]
    y2, w2, mask2 = y[perm], w[perm], mask[perm]
    ref = _reference(tp, x, y2, w2, dst2, src2, mask2, N)
    out = fused_tp_scatter(tp, x, y2, w2, dst2, src2, mask2, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)


def test_multitile(setup):
    tp, x, y, w, dst, src, mask, _ = setup
    N = 384  # three tiles
    r = np.random.RandomState(2)
    x3 = jnp.asarray(r.standard_normal((N, tp.irreps_in1.dim)))
    dst3 = jnp.asarray(np.sort(r.randint(0, N - 1, dst.shape[0])), dtype=jnp.int32)
    src3 = jnp.asarray(r.randint(0, N - 1, dst.shape[0]), dtype=jnp.int32)
    ref = _reference(tp, x3, y, w, dst3, src3, mask, N)
    out = fused_tp_scatter(tp, x3, y, w, dst3, src3, mask, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)


def test_gradient_parity(setup):
    tp, x, y, w, dst, src, mask, N = setup

    def loss_fused(x, y, w):
        return jnp.sum(fused_tp_scatter(tp, x, y, w, dst, src, mask, N) ** 2)

    def loss_ref(x, y, w):
        return jnp.sum(_reference(tp, x, y, w, dst, src, mask, N) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, y, w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, y, w)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)


def test_masked_edges_contribute_nothing(setup):
    tp, x, y, w, dst, src, mask, N = setup
    # poison the masked (padded) slots: results must not change
    bad_y = y.at[300:].set(1e6)
    bad_w = w.at[300:].set(1e6)
    out1 = fused_tp_scatter(tp, x, y, w, dst, src, mask, N)
    out2 = fused_tp_scatter(tp, x, bad_y, bad_w, dst, src, mask, N)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-10)


def test_fused_mlp_variant_parity_and_grads(setup):
    """Kernel v2 (radial MLP fused in-kernel) vs XLA reference, incl. grads
    w.r.t. features, SH, embeddings and MLP parameters."""
    from nequip_tpu.ops.mlp import ScalarMLP
    from nequip_tpu.ops.pallas.tp_scatter import fused_tp_scatter_mlp
    from nequip_tpu.ops.scatter import scatter_sum

    tp, x, y, w, dst, src, mask, N = setup
    r = np.random.RandomState(7)
    n_emb = 8
    mlp = ScalarMLP(
        input_dim=n_emb, output_dim=tp.weight_numel,
        hidden_layers_depth=1, hidden_layers_width=16,
        nonlinearity="silu", bias=False,
    )
    mlp_params = mlp.init(jax.random.PRNGKey(2))
    emb = jnp.asarray(r.standard_normal((dst.shape[0], n_emb)))
    # reference masks the embedding exactly like the kernel does
    emb_masked = jnp.where(mask[:, None], emb, 0)

    def ref(x, emb, p):
        wts = mlp(p, emb_masked_of(emb))
        xs = jnp.take(x, src, axis=0)
        return scatter_sum(tp(xs, y, wts), dst, num_segments=N, mask=mask)

    def emb_masked_of(e):
        return jnp.where(mask[:, None], e, 0)

    def fused(x, emb, p):
        return fused_tp_scatter_mlp(tp, mlp, x, y, emb, p, dst, src, mask, N)

    out_r = ref(x, emb, mlp_params)
    out_f = fused(x, emb, mlp_params)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r), atol=1e-9)

    def loss(fn):
        return lambda x, emb, p: jnp.sum(fn(x, emb, p) ** 2)

    gr = jax.grad(loss(ref), argnums=(0, 1, 2))(x, emb, mlp_params)
    gf = jax.grad(loss(fused), argnums=(0, 1, 2))(x, emb, mlp_params)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]), atol=1e-8)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]), atol=1e-8)
    for k in mlp_params:
        np.testing.assert_allclose(
            np.asarray(gf[2][k]), np.asarray(gr[2][k]), atol=1e-8, err_msg=k
        )


def test_second_order_parity(setup):
    """Reverse-over-reverse through the fused kernels == XLA reference.

    This is the force-loss training pattern: an inner vjp (forces) whose
    result feeds a scalar loss that is differentiated again. The fused op's
    backward is itself custom_vjp'd in terms of the kernel family
    (closure under differentiation), so no XLA TP fallback is needed.
    """
    tp, x, y, w, dst, src, mask, N = setup
    r = np.random.RandomState(42)
    gref = jnp.asarray(r.standard_normal((N, tp.irreps_out.dim)))
    tgt = jnp.asarray(r.standard_normal(y.shape))

    def make_force_loss(op):
        def force_loss(x, y, w):
            # "forces": cotangent of y (positions enter via the SH in the
            # real model), from an inner reverse pass
            _, vjp = jax.vjp(lambda yy: op(x, yy, w), y)
            (fy,) = vjp(gref)
            return jnp.sum((fy - tgt) ** 2) + jnp.sum(fy * y)
        return force_loss

    fused_op = lambda xx, yy, ww: fused_tp_scatter(tp, xx, yy, ww, dst, src, mask, N)
    ref_op = lambda xx, yy, ww: _reference(tp, xx, yy, ww, dst, src, mask, N)

    lf = make_force_loss(fused_op)
    lr = make_force_loss(ref_op)
    np.testing.assert_allclose(float(lf(x, y, w)), float(lr(x, y, w)), rtol=1e-10)

    gf = jax.grad(lf, argnums=(0, 1, 2))(x, y, w)
    gr = jax.grad(lr, argnums=(0, 1, 2))(x, y, w)
    for a, b, name in zip(gf, gr, "xyw"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9,
            err_msg=f"2nd-order cotangent mismatch for {name}",
        )


def test_second_order_parity_fused_mlp(setup):
    """Reverse-over-reverse through the MLP-fused (kernel v2) variant == XLA.

    Force-loss training on ``pallas_fused``: the monolithic backward kernel
    is itself custom_vjp'd via a differentiable composition (XLA radial MLP
    + the AD-closed trilinear kernel family), so the fully-fused path trains.
    Checks the 2nd-order cotangents of node features, SH, embeddings AND the
    MLP parameters (the training-relevant ones).
    """
    from nequip_tpu.ops.mlp import ScalarMLP
    from nequip_tpu.ops.pallas.tp_scatter import fused_tp_scatter_mlp
    from nequip_tpu.ops.scatter import scatter_sum

    tp, x, y, w, dst, src, mask, N = setup
    r = np.random.RandomState(11)
    n_emb = 8
    mlp = ScalarMLP(
        input_dim=n_emb, output_dim=tp.weight_numel,
        hidden_layers_depth=1, hidden_layers_width=16,
        nonlinearity="silu", bias=False,
    )
    p = mlp.init(jax.random.PRNGKey(5))
    emb = jnp.asarray(r.standard_normal((dst.shape[0], n_emb)))
    gref = jnp.asarray(r.standard_normal((N, tp.irreps_out.dim)))
    tgt = jnp.asarray(r.standard_normal(y.shape))

    def ref_op(xx, yy, ee, pp):
        wts = mlp(pp, jnp.where(mask[:, None], ee, 0))
        xs = jnp.take(xx, src, axis=0)
        return scatter_sum(tp(xs, yy, wts), dst, num_segments=N, mask=mask)

    def fused_op(xx, yy, ee, pp):
        return fused_tp_scatter_mlp(tp, mlp, xx, yy, ee, pp, dst, src, mask, N)

    def make_force_loss(op):
        def force_loss(xx, ee, pp):
            # "forces": inner vjp w.r.t. the SH input (positions enter via
            # the SH in the real model), differentiated again
            _, vjp = jax.vjp(lambda yy: op(xx, yy, ee, pp), y)
            (fy,) = vjp(gref)
            return jnp.sum((fy - tgt) ** 2) + jnp.sum(fy * y)
        return force_loss

    lf = make_force_loss(fused_op)
    lr = make_force_loss(ref_op)
    np.testing.assert_allclose(float(lf(x, emb, p)), float(lr(x, emb, p)), rtol=1e-10)

    gf = jax.grad(lf, argnums=(0, 1, 2))(x, emb, p)
    gr = jax.grad(lr, argnums=(0, 1, 2))(x, emb, p)
    for a, b, name in zip(gf[:2], gr[:2], ("x", "emb")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9,
            err_msg=f"2nd-order cotangent mismatch for {name}",
        )
    for k in p:
        np.testing.assert_allclose(
            np.asarray(gf[2][k]), np.asarray(gr[2][k]), rtol=1e-7, atol=1e-9,
            err_msg=f"2nd-order param cotangent mismatch for {k}",
        )


def test_third_order_runs(setup):
    """The family is closed at every order: grad^3 traces and is finite."""
    tp, x, y, w, dst, src, mask, N = setup

    def e(yy):
        return jnp.sum(fused_tp_scatter(tp, x, yy, w, dst, src, mask, N) ** 2)

    g3 = jax.grad(lambda yy: jnp.sum(jax.grad(lambda z: jnp.sum(jax.grad(e)(z) ** 2))(yy) ** 2))(y)
    assert np.all(np.isfinite(np.asarray(g3)))


def test_precomputed_layout_parity(setup):
    """Layouts precomputed once (MD skin-rebuild pattern) give identical
    results and gradients to the in-graph layout path."""
    from nequip_tpu.ops.pallas.tp_scatter import compute_edge_layout

    tp, x, y, w, dst, src, mask, N = setup
    layout = compute_edge_layout(dst, src, mask, N)
    out_inline = fused_tp_scatter(tp, x, y, w, dst, src, mask, N)
    out_pre = fused_tp_scatter(tp, x, y, w, dst, src, mask, N, layout=layout)
    np.testing.assert_array_equal(np.asarray(out_pre), np.asarray(out_inline))

    def loss(fn_layout):
        def f(x_, w_):
            return jnp.sum(
                fused_tp_scatter(tp, x_, y, w_, dst, src, mask, N, layout=fn_layout) ** 2
            )
        return f

    gx_i, gw_i = jax.grad(loss(None), argnums=(0, 1))(x, w)
    gx_p, gw_p = jax.grad(loss(layout), argnums=(0, 1))(x, w)
    np.testing.assert_array_equal(np.asarray(gx_p), np.asarray(gx_i))
    np.testing.assert_array_equal(np.asarray(gw_p), np.asarray(gw_i))


def test_pallas_scatter_sum_matches_segment_sum():
    """The generic one-hot-matmul row scatter (used for the backward's dx
    reduction) equals XLA segment_sum, with and without masks, for
    tile-aligned and non-aligned (fallback) capacities."""
    from nequip_tpu.ops.pallas.tp_scatter import (
        compute_edge_layout,
        pallas_scatter_sum,
    )
    from nequip_tpu.ops.scatter import scatter_sum

    r = np.random.RandomState(3)
    M, D = 1000, 96
    for num_rows in (256, 200):  # tile-aligned (kernel) and fallback
        vals = jnp.asarray(r.standard_normal((M, D)))
        idx = jnp.asarray(r.randint(0, num_rows, M), dtype=jnp.int32)
        mask = jnp.asarray(r.rand(M) > 0.2)
        want = scatter_sum(vals, idx, num_segments=num_rows, mask=mask)
        got = pallas_scatter_sum(vals, idx, num_rows, mask=mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)
        # maskless
        want = scatter_sum(vals, idx, num_segments=num_rows)
        got = pallas_scatter_sum(vals, idx, num_rows)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)
    # precomputed layout path is bit-equal to in-graph
    num_rows = 256
    vals = jnp.asarray(r.standard_normal((M, D)))
    idx = jnp.asarray(r.randint(0, num_rows, M), dtype=jnp.int32)
    mask = jnp.asarray(r.rand(M) > 0.2)
    lay = compute_edge_layout(idx, idx, mask, num_rows)
    a = pallas_scatter_sum(vals, idx, num_rows, mask=mask, layout=lay)
    b = pallas_scatter_sum(vals, idx, num_rows, mask=mask)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stale_layout_guard(setup, monkeypatch):
    """NEQUIP_PALLAS_CHECK_LAYOUT=1 catches a layout whose edge list changed
    after attach (shape-compatible staleness is otherwise silent), and the
    data-side edge mutators strip __edge_layout_* keys."""
    from nequip_tpu.ops.pallas.tp_scatter import compute_edge_layout

    monkeypatch.setenv("NEQUIP_PALLAS_CHECK_LAYOUT", "1")
    tp, x, y, w, dst, src, mask, N = setup
    layout = compute_edge_layout(dst, src, mask, N)
    # unchanged edges: passes
    fused_tp_scatter(tp, x, y, w, dst, src, mask, N, layout=layout)

    # permuted edge list with the SAME shape: must be detected
    perm = np.random.RandomState(3).permutation(dst.shape[0])
    with pytest.raises(Exception, match="stale precomputed edge layout"):
        out = fused_tp_scatter(
            tp, x, jnp.take(y, perm, axis=0), jnp.take(w, perm, axis=0),
            jnp.take(dst, perm), jnp.take(src, perm), jnp.take(mask, perm),
            N, layout=layout,
        )
        jax.block_until_ready(out)

    # data-side strip: rebuilding the neighborlist removes attached layouts
    from nequip_tpu.data import _keys, compute_neighborlist_

    frame = {
        _keys.POSITIONS_KEY: np.random.RandomState(0).uniform(0, 6, (20, 3)),
        _keys.CELL_KEY: np.eye(3) * 6.0,
        _keys.PBC_KEY: np.array([True] * 3),
        _keys.EDGE_LAYOUT_KEY_PREFIX + "128x256": {"take_idx": np.zeros(4)},
    }
    out_frame = compute_neighborlist_(frame, 3.0)
    assert not any(
        k.startswith(_keys.EDGE_LAYOUT_KEY_PREFIX) for k in out_frame
    )
