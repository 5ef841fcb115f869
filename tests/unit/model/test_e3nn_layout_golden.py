"""Hand-built e3nn layout goldens (VERDICT r2 missing #4).

The importer round-trip test (``test_e3nn_import.py``) proves import is the
inverse of export — but a WRONG layout assumption would round-trip
perfectly.  These tests kill that failure mode without torch: each weight
transform the importer performs is checked against an INDEPENDENT plain-
numpy computation whose layout is hand-coded from the documented e3nn
contract (``/root/reference/nequip/nn/interaction_block.py:82-146`` and the
e3nn conventions it relies on):

* ``o3.Linear``: one flat vector of per-instruction ``(mul_in, mul_out)``
  row-major blocks, instructions enumerated input-major, with
  ``path_normalization="element"`` alphas (1/sqrt(sum of mul_in feeding the
  output)) applied at runtime;
* conv ``uvu`` TP: per-edge weight vector = per-instruction ``(mul1, mul2)``
  blocks concatenated in instruction order (the radial MLP's output
  contract, ``interaction_block.py:119-127``);
* ``FullyConnectedTensorProduct``: one flat vector of per-path
  ``(mul1, mul2, mul_out)`` blocks in the (in1, in2, out) triple-loop order;
* radial ScalarMLP: torch ``nn.Linear`` stores ``(out, in)`` — imported
  transposed — with runtime alphas ``gain/sqrt(fan_in)`` on both sides.

CG/SH *values* are taken from the repo's own tables (basis-convention
invariance is argued in ``model/e3nn_import.py``; the tables carry their own
build-time equivariance self-checks) — what is pinned here is every layout,
ordering, reshape, transpose, and normalization the importer assumes.
"""

import numpy as np
import jax.numpy as jnp

from nequip_tpu.model.e3nn_import import _split_linear
from nequip_tpu.ops import Irreps, TensorProduct, uvu_instructions
from nequip_tpu.ops.cg import cg_component_normalized
from nequip_tpu.ops.linear import Linear
from nequip_tpu.ops.mlp import ScalarMLP
from nequip_tpu.ops.tensor_product import fully_connected_tensor_product


def test_linear_flat_layout_and_element_alphas():
    """Two scalar input chunks feeding ONE output chunk: the flat vector is
    [W00 (2x4 row-major), W10 (3x4)], both paths scaled by 1/sqrt(2+3)."""
    lin = Linear("2x0e+3x0e", "4x0e")
    assert lin.instructions == [(0, 0), (1, 0)]

    rng = np.random.RandomState(0)
    W00 = rng.standard_normal((2, 4))
    W10 = rng.standard_normal((3, 4))
    flat = np.concatenate([W00.reshape(-1), W10.reshape(-1)])
    x = rng.standard_normal((5, 5))  # [batch, 2+3 scalars]

    expected = (x[:, :2] @ W00 + x[:, 2:] @ W10) / np.sqrt(5.0)

    params = _split_linear(flat, lin)
    got = np.asarray(lin({k: jnp.asarray(v) for k, v in params.items()}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_linear_vector_chunk_no_m_mixing():
    """1e -> 1e: W is (mul_in, mul_out), applied identically per m component
    (ir_mul feature layout: chunk reshapes to (2l+1, mul))."""
    lin = Linear("2x1e", "3x1e")
    rng = np.random.RandomState(1)
    W = rng.standard_normal((2, 3))
    x = rng.standard_normal((4, 6))  # chunk = (3 m, 2 mul) row-major

    xm = x.reshape(4, 3, 2)
    expected = (xm @ W / np.sqrt(2.0)).reshape(4, 9)

    params = _split_linear(W.reshape(-1), lin)
    got = np.asarray(lin({k: jnp.asarray(v) for k, v in params.items()}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_uvu_tp_weight_vector_layout():
    """The conv TP consumes per-edge weights as per-instruction (mul1, mul2)
    blocks in instruction order; instructions enumerate (in1-chunk, SH-chunk)
    input-major with one output chunk per path (so every path's element-fan
    is mul2=1 and path_weight is 1); output chunks are sorted by (l, p)."""
    feats = Irreps("2x0e+2x1o")
    sh = Irreps.spherical_harmonics(1)  # 1x0e+1x1o (physical SH parity)
    mid, ins = uvu_instructions(feats, sh, feats)
    tp = TensorProduct(feats, sh, mid, ins, shared_weights=False)

    # input-major enumeration: (0e x 0e -> 0e), (0e x 1o -> 1o),
    # (1o x 0e -> 1o), (1o x 1o -> 0e); output chunks sorted by (l, p)
    assert [(i.i_in1, i.i_in2) for i in tp.instructions] == [
        (0, 0), (0, 1), (1, 0), (1, 1)
    ]
    assert [(mid[i.i_out].ir.l, mid[i.i_out].ir.p) for i in tp.instructions] == [
        (0, 1), (1, -1), (1, -1), (0, 1)
    ]
    assert tp.weight_numel == 4 * 2

    rng = np.random.RandomState(2)
    E = 7
    x1 = rng.standard_normal((E, feats.dim))
    x2 = rng.standard_normal((E, sh.dim))
    w = rng.standard_normal((E, tp.weight_numel))

    # independent numpy: hand-coded layout, repo CG values
    sl1 = feats.slices()
    sl2 = sh.slices()
    sl3 = mid.slices()
    expected = np.zeros((E, mid.dim))
    for p_idx, i in enumerate(tp.instructions):
        mi1, mi2, mi3 = feats[i.i_in1], sh[i.i_in2], mid[i.i_out]
        cg = cg_component_normalized(mi1.ir.l, mi2.ir.l, mi3.ir.l)
        c1 = x1[:, sl1[i.i_in1]].reshape(E, mi1.ir.dim, mi1.mul)
        c2 = x2[:, sl2[i.i_in2]].reshape(E, mi2.ir.dim, 1)
        wp = w[:, 2 * p_idx : 2 * p_idx + 2]  # (mul1, mul2)=(2,1) block
        out = np.einsum("ijk,eiu,ej,eu->eku", cg, c1, c2[:, :, 0], wp)
        # one output chunk per path -> element fan = mul2 = 1 -> weight 1
        assert abs(i.path_weight - 1.0) < 1e-12
        expected[:, sl3[i.i_out]] += out.reshape(E, mi3.dim)

    got = np.asarray(tp(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(w)))
    np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-12)


def test_fully_connected_tp_flat_layout():
    """Self-connection weights: flat per-path (mul1, mul2, mul_out) blocks in
    (in1, in2, out) triple-loop order, element fan mul1*mul2 per output."""
    fc = fully_connected_tensor_product("2x0e+1x1e", "3x0e", "2x0e+2x1e")
    # paths: (0e x 0e -> 0e) [2*3*2=12], (1e x 0e -> 1e) [1*3*2=6]
    assert fc.weight_numel == 12 + 6

    rng = np.random.RandomState(3)
    N = 4
    x1 = rng.standard_normal((N, 5))
    x2 = rng.standard_normal((N, 3))
    flat = rng.standard_normal(fc.weight_numel)

    W0 = flat[:12].reshape(2, 3, 2)
    W1 = flat[12:].reshape(1, 3, 2)
    cg000 = float(cg_component_normalized(0, 0, 0)[0, 0, 0])
    cg101 = cg_component_normalized(1, 0, 1)  # (3, 1, 3)

    expected = np.zeros((N, 8))
    # 0e x 0e -> 0e: element fan = 2*3
    expected[:, 0:2] = cg000 * np.einsum(
        "eu,ev,uvw->ew", x1[:, :2], x2, W0
    ) / np.sqrt(6.0)
    # 1e x 0e -> 1e (ir_mul: (3 m, 1 mul) chunk; x2 chunk is (1 m, 3 mul)),
    # fan = 1*3
    c1 = x1[:, 2:5].reshape(N, 3, 1)
    c2 = x2.reshape(N, 1, 3)
    expected[:, 2:8] = (
        np.einsum("ijk,eiu,ejv,uvw->ekw", cg101, c1, c2, W1) / np.sqrt(3.0)
    ).reshape(N, 6)

    got = np.asarray(fc(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(flat)))
    np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-12)


def test_scalar_mlp_torch_transpose_and_alphas():
    """torch nn.Linear stores (out, in); the importer transposes to (in, out).
    Runtime alphas are gain/sqrt(fan_in) with gain≈1.5596 (silu) on hidden
    transitions — hand-compute the forward from the torch-layout matrices."""
    mlp = ScalarMLP(4, 3, hidden_layers_depth=1, hidden_layers_width=6,
                    bias=False, nonlinearity="silu")
    assert mlp.dims == [4, 6, 3]

    rng = np.random.RandomState(4)
    Wt0 = rng.standard_normal((6, 4))  # torch (out, in)
    Wt1 = rng.standard_normal((3, 6))
    x = rng.standard_normal((5, 4))

    def silu(v):
        return v / (1.0 + np.exp(-v))

    a0, a1 = mlp.alphas
    np.testing.assert_allclose(a0, 1.0 / np.sqrt(4.0), rtol=1e-12)  # input layer gain 1
    h = silu((x @ Wt0.T) * a0)
    expected = (h @ Wt1.T) * a1

    params = {"w0": jnp.asarray(Wt0.T), "w1": jnp.asarray(Wt1.T)}
    got = np.asarray(mlp(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-10)
