"""Tangent-fused trilinear kernels == the 4-call dual sweep, at float64.

The fr force-grad mode's dual sweep is four trilinear kernel calls per edge
slice (primal + three jvp terms); ``_jvp_forward`` / ``_jvp_backward_kernel_call``
fuse them into one pass each (shared operand loads, one one-hot scatter,
in-kernel pre-summed dx).  These gates pin the fused kernels to the 4-call
composition exactly — same mathematical object, to f64 tolerance — and the
``NEQUIP_JVP_FUSED=0`` kill switch to the fused default through
``chunked_jvp_conv``.

Reference analog: none (the reference has no forward-mode force path at all);
the 4-call sweep itself is gated against reverse-mode in
``tests/unit/train/test_fr.py``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nequip_tpu.ops import Irreps, TensorProduct, uvu_instructions
from nequip_tpu.ops.pallas import tp_scatter as tps


ROWS, BLOCK_E = 128, 256


@pytest.fixture(scope="module")
def setup():
    r = np.random.RandomState(3)
    feats = Irreps("8x0e+8x1o+8x2e")
    sh = Irreps.spherical_harmonics(2)
    target = feats + Irreps("8x1e+8x2o")
    mid, ins = uvu_instructions(feats, sh, target)
    tp = TensorProduct(feats, sh, mid, ins)

    N = 2 * ROWS
    E = 700
    dst = np.sort(r.randint(0, N, E)).astype(np.int32)
    src = r.randint(0, N, E).astype(np.int32)
    mask = np.ones(E, bool)
    mask[-40:] = r.rand(40) > 0.5  # some masked real edges
    take_idx, rel_dst, chunk_tile, chunk_first, valid = tps._layout_edges(
        jnp.asarray(dst), jnp.asarray(src), jnp.asarray(mask), N, ROWS, BLOCK_E
    )
    E_pal = int(take_idx.shape[0])
    safe = jnp.minimum(take_idx, E - 1)
    wmask = valid & jnp.take(jnp.asarray(mask), safe)
    src_lay = jnp.where(
        valid, jnp.take(jnp.asarray(src), safe), N - 1
    ).astype(jnp.int32)
    layout = {
        "take_idx": None,  # identity: all per-edge streams in slot order
        "rel_dst": jnp.where(wmask, rel_dst, -1).astype(jnp.int32),
        "chunk_tile": chunk_tile,
        "chunk_first": chunk_first,
        "valid": wmask,
        "dx": "segsum",
    }

    def s(*shape):
        return jnp.asarray(r.standard_normal(shape))

    data = dict(
        x=s(N, tp.irreps_in1.dim),
        tx=s(N, tp.irreps_in1.dim),
        y=s(E_pal, tp.irreps_in2.dim),
        ty=s(E_pal, tp.irreps_in2.dim),
        w=jnp.where(wmask[:, None], s(E_pal, tp.weight_numel), 0.0),
        dw=jnp.where(wmask[:, None], s(E_pal, tp.weight_numel), 0.0),
        g=s(N, tp.irreps_out.dim),
        gt=s(N, tp.irreps_out.dim),
    )
    return tp, layout, src_lay, N, data


def _fwd_4call(tp, layout, src, N, d, acc):
    kw = dict(num_nodes=N, rows=ROWS, block_e=BLOCK_E, layout=layout)
    msg = tps._forward(tp, d["x"], d["y"], d["w"], src, src, None,
                       acc=acc[0], **kw)
    tmsg = tps._forward(tp, d["tx"], d["y"], d["w"], src, src, None,
                        acc=acc[1], **kw)
    tmsg = tps._forward(tp, d["x"], d["ty"], d["w"], src, src, None,
                        acc=tmsg, **kw)
    tmsg = tps._forward(tp, d["x"], d["y"], d["dw"], src, src, None,
                        acc=tmsg, **kw)
    return msg, tmsg


@pytest.mark.parametrize("with_acc", [False, True])
def test_jvp_forward_matches_4call(setup, with_acc):
    tp, layout, src, N, d = setup
    mid = tp.irreps_out.dim
    r = np.random.RandomState(9)
    if with_acc:
        acc = (jnp.asarray(r.standard_normal((N, mid))),
               jnp.asarray(r.standard_normal((N, mid))))
    else:
        acc = (jnp.zeros((N, mid)), jnp.zeros((N, mid)))
    m0, t0 = _fwd_4call(tp, layout, src, N, d, acc)
    m1, t1 = tps._jvp_forward(
        tp, d["x"], d["tx"], d["y"], d["ty"], d["w"], d["dw"], src, N,
        layout, ROWS, BLOCK_E, acc=acc if with_acc else None,
    )
    if not with_acc:
        # the 4-call reference always folds through acc (zeros here)
        pass
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), rtol=1e-12, atol=1e-12)


def test_jvp_backward_matches_4call(setup):
    tp, layout, src, N, d = setup
    plan = tps._TPPlan(tp)
    B = lambda xx, yy, ww, gg: tps._backward_kernel_call(
        tp, plan, xx, yy, ww, src, src, None, N, ROWS, BLOCK_E, gg,
        layout=layout,
    )
    dx1, dy1, dw1 = B(d["x"], d["y"], d["w"], d["g"])
    dx2, dy2, dw2 = B(d["tx"], d["y"], d["w"], d["gt"])
    dx3, dy3, dw3 = B(d["x"], d["ty"], d["w"], d["gt"])
    dx4, dy4, dw4 = B(d["x"], d["y"], d["dw"], d["gt"])
    ref = dict(
        dx=dx1 + dx3 + dx4, dtx=dx2,
        dy=dy1 + dy2 + dy4, dty=dy3,
        cw=dw1 + dw2 + dw3, cdw=dw4,
    )
    dx, dtx, dy, dty, cw, cdw = tps._jvp_backward_kernel_call(
        tp, plan, d["x"], d["tx"], d["y"], d["ty"], d["w"], d["dw"], src,
        N, ROWS, BLOCK_E, d["g"], d["gt"], layout=layout,
    )
    got = dict(dx=dx, dtx=dtx, dy=dy, dty=dty, cw=cw, cdw=cdw)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-12, atol=1e-12,
            err_msg=k,
        )


def test_jvp_fused_kill_switch(setup, monkeypatch):
    """chunked_jvp_conv: NEQUIP_JVP_FUSED=0 (4-call) == default (fused),
    values and grads."""
    from nequip_tpu.ops.mlp import ScalarMLP

    tp, layout, src, N, d = setup
    E_pal = int(d["y"].shape[0])
    mlp = ScalarMLP(
        8, tp.weight_numel, hidden_layers_depth=1, hidden_layers_width=16,
        bias=False, nonlinearity="silu",
    )
    params = jax.tree.map(
        lambda a: a.astype(jnp.float64), mlp.init(jax.random.PRNGKey(0))
    )
    r = np.random.RandomState(11)
    emb = jnp.asarray(r.standard_normal((E_pal, 8)))
    temb = jnp.asarray(r.standard_normal((E_pal, 8)))
    gm = jnp.asarray(r.standard_normal((N, tp.irreps_out.dim)))
    gt = jnp.asarray(r.standard_normal((N, tp.irreps_out.dim)))

    n_chunks = E_pal // BLOCK_E  # all slices single-chunk (G here is prime)

    def loss(x, tx, emb_, temb_, p):
        msg, tmsg = tps.chunked_jvp_conv(
            tp, mlp, p, x, tx, d["y"], d["ty"], emb_, temb_, src, layout,
            N, n_chunks, ROWS, BLOCK_E,
        )
        return jnp.vdot(msg, gm) + jnp.vdot(tmsg, gt)

    args = (d["x"], d["tx"], emb, temb, params)
    monkeypatch.setenv("NEQUIP_JVP_FUSED", "0")
    v0, g0 = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    monkeypatch.setenv("NEQUIP_JVP_FUSED", "1")
    v1, g1 = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-12)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12
        ),
        g0, g1,
    )
