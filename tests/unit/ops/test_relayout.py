"""Gates for the pre-laid-out edge stream (``relayout_edge_stream``).

The relayout permutes the edge list into kernel layout-slot order at the
model boundary so every take_idx-keyed gather/scatter inside the Pallas
TP-scatter family collapses away (VERDICT r3 item 4: the glue-bound
backward).  These tests pin:

* stream invariants: the relaid stream preserves the (masked) edge multiset,
  stays dst-sorted (downstream layout passes ride the cheap sortedness
  path), is idempotent, and carries the identity layout (take_idx None);
* end-to-end model parity: a Pallas model (which auto-relays at
  ``GraphModel.__call__``) matches the XLA implementation for energies,
  forces, stress, and parameter gradients on a tile-aligned batch;
* fr == rr on the relaid stream (the dual sweep runs the same kernels).

Runs in Pallas interpret mode on CPU (same code Mosaic-compiles on TPU).
"""

import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp
import pytest

from nequip_tpu.data import _keys
from nequip_tpu.ops.pallas.tp_scatter import (
    DEFAULT_BLOCK_E,
    DEFAULT_ROWS,
    attach_edge_layouts,
    layout_key,
    relayout_edge_stream,
)


def _synthetic_stream(seed=0, N=256, E=700, E_cap=768, n_masked=40):
    r = np.random.RandomState(seed)
    dst = np.sort(r.randint(0, N - 3, E))
    src = r.randint(0, N - 3, E)
    dst_full = np.concatenate([dst, np.full(E_cap - E, N - 1)])
    src_full = np.concatenate([src, np.full(E_cap - E, N - 1)])
    mask = np.arange(E_cap) < E
    # also mask a few REAL slots (mid-stream holes, like per-edge-type
    # cutoff pruning produces)
    mask[r.choice(E, n_masked, replace=False)] = False
    data = {
        _keys.POSITIONS_KEY: jnp.asarray(r.standard_normal((N, 3))),
        _keys.EDGE_INDEX_KEY: jnp.asarray(
            np.stack([dst_full, src_full]), dtype=jnp.int32
        ),
        _keys.EDGE_MASK_KEY: jnp.asarray(mask),
        _keys.EDGE_CELL_SHIFT_KEY: jnp.asarray(
            r.randint(-1, 2, (E_cap, 3)).astype(np.float64)
        ),
    }
    return data


def _masked_edge_multiset(data):
    ei = np.asarray(data[_keys.EDGE_INDEX_KEY])
    m = np.asarray(data[_keys.EDGE_MASK_KEY])
    shifts = np.asarray(data[_keys.EDGE_CELL_SHIFT_KEY])
    rows = [
        (int(ei[0, i]), int(ei[1, i])) + tuple(shifts[i])
        for i in range(ei.shape[1])
        if m[i]
    ]
    return sorted(rows)


def test_stream_invariants():
    data = _synthetic_stream()
    out = relayout_edge_stream(data)
    lay = out[layout_key()]
    assert lay["take_idx"] is None
    E_pal = out[_keys.EDGE_INDEX_KEY].shape[1]
    assert E_pal % DEFAULT_BLOCK_E == 0
    assert out[_keys.EDGE_MASK_KEY].shape == (E_pal,)
    assert lay["rel_dst"].shape == (E_pal,)
    # masked multiset of (dst, src, shift) rows is preserved exactly
    assert _masked_edge_multiset(out) == _masked_edge_multiset(data)
    # dst stream stays globally non-decreasing (padding slots take the last
    # node of their chunk's tile)
    new_dst = np.asarray(out[_keys.EDGE_INDEX_KEY][0])
    assert np.all(np.diff(new_dst) >= 0)
    # padding slots: inert self-edges with zero shifts; every non-live slot
    # (masked or padding) has rel_dst == -1
    m = np.asarray(out[_keys.EDGE_MASK_KEY])
    valid = np.asarray(lay["valid"])
    np.testing.assert_array_equal(valid, m)
    ei = np.asarray(out[_keys.EDGE_INDEX_KEY])
    pad = np.asarray(lay["rel_dst"]) == -1
    E_real = data[_keys.EDGE_INDEX_KEY].shape[1]
    n_pad = ei.shape[1] - E_real
    # at least the always-padding tail slots are self-edges
    assert n_pad > 0
    self_edge = ei[0] == ei[1]
    assert self_edge[pad & (np.arange(ei.shape[1]) >= 0)].sum() >= n_pad
    rel = np.asarray(lay["rel_dst"])
    assert np.all(rel[~m] == -1)
    assert np.all(rel[m] >= 0)
    # rel_dst is consistent with the new dst stream on live slots
    tiles = np.repeat(np.asarray(lay["chunk_tile"]), DEFAULT_BLOCK_E)
    assert np.all(new_dst[m] == tiles[m] * DEFAULT_ROWS + rel[m])
    # idempotent (returns the same dict unchanged)
    again = relayout_edge_stream(out)
    assert again is out


def test_noop_conditions():
    data = _synthetic_stream(N=200)  # 200 % 128 != 0 -> no-op
    assert relayout_edge_stream(data) is data
    data = _synthetic_stream()
    data[_keys.EDGE_VECTORS_KEY] = jnp.zeros(
        (data[_keys.EDGE_INDEX_KEY].shape[1], 3)
    )
    assert relayout_edge_stream(data) is data


def test_precomputed_layout_reused():
    """Relayout after attach_edge_layouts must agree with the from-scratch
    path (the attached layout and its dx sub-layout are reused)."""
    data = _synthetic_stream(seed=3)
    a = relayout_edge_stream(attach_edge_layouts(data))
    b = relayout_edge_stream(data)
    for k in (_keys.EDGE_INDEX_KEY, _keys.EDGE_MASK_KEY, _keys.EDGE_CELL_SHIFT_KEY):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    la, lb = a[layout_key()], b[layout_key()]
    for k in ("rel_dst", "chunk_tile", "chunk_first", "valid", "fingerprint"):
        np.testing.assert_array_equal(np.asarray(la[k]), np.asarray(lb[k]))
    # the dx sub-layouts may place DEAD slots differently (the reused one was
    # keyed on clipped src values, the fresh one on pad_node self-edges) but
    # must be functionally identical as scatter plans
    from nequip_tpu.ops.pallas.tp_scatter import pallas_scatter_sum

    r = np.random.RandomState(9)
    src = jnp.asarray(np.asarray(a[_keys.EDGE_INDEX_KEY][1]))
    wm = a[_keys.EDGE_MASK_KEY]
    vals = jnp.asarray(r.standard_normal((src.shape[0], 8)))
    N = a[_keys.POSITIONS_KEY].shape[0]
    out_a = pallas_scatter_sum(vals, src, N, mask=wm, layout=la["dx"])
    out_b = pallas_scatter_sum(vals, src, N, mask=wm, layout=lb["dx"])
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-12)


@pytest.fixture(scope="module")
def model_pair():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _example_model_and_batch

    # n_atoms=108 -> fcc 3x3x3 cell (108 atoms), padded to 128 nodes: the
    # tile-aligned capacity turns the relayout ON for the pallas model
    m_x, p_x, d_x = _example_model_and_batch(n_atoms=108, tp_impl="xla")
    m_p, p_p, d_p = _example_model_and_batch(n_atoms=108, tp_impl="pallas")
    assert m_p.uses_pallas_kernels and not m_x.uses_pallas_kernels
    return (m_x, p_x, d_x), (m_p, p_p, d_p)


def test_model_parity_with_relayout(model_pair):
    (m_x, p_x, d_x), (m_p, p_p, d_p) = model_pair
    out_x = m_x(p_x, d_x)
    out_p = m_p(p_p, d_p)
    np.testing.assert_allclose(
        np.asarray(out_p[_keys.TOTAL_ENERGY_KEY]),
        np.asarray(out_x[_keys.TOTAL_ENERGY_KEY]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_p[_keys.FORCE_KEY]),
        np.asarray(out_x[_keys.FORCE_KEY]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_p[_keys.STRESS_KEY]),
        np.asarray(out_x[_keys.STRESS_KEY]),
        rtol=1e-4, atol=1e-6,
    )


def test_param_grad_parity_with_relayout(model_pair):
    (m_x, p_x, d_x), (m_p, p_p, d_p) = model_pair
    rng = np.random.RandomState(7)
    v_f = jnp.asarray(rng.standard_normal(d_x[_keys.POSITIONS_KEY].shape))

    def loss(model, params, data):
        out = model(params, data)
        nm = data[_keys.NODE_MASK_KEY][:, None]
        return (
            jnp.sum(out[_keys.TOTAL_ENERGY_KEY])
            + jnp.sum(jnp.where(nm, out[_keys.FORCE_KEY] * v_f, 0.0))
        )

    g_x = jax.grad(lambda p: loss(m_x, p, d_x))(p_x)
    g_p = jax.grad(lambda p: loss(m_p, p, d_p))(p_p)
    flat_x, _ = jax.flatten_util.ravel_pytree(g_x)
    flat_p, _ = jax.flatten_util.ravel_pytree(g_p)
    scale = np.maximum(np.abs(np.asarray(flat_x)).max(), 1e-30)
    np.testing.assert_allclose(
        np.asarray(flat_p) / scale, np.asarray(flat_x) / scale, atol=2e-4
    )


def test_src_sort_stream_invariants(monkeypatch):
    """NEQUIP_RELAYOUT_SRC_SORT=1: same multiset, tile-sorted dst, src
    ascending within every tile's live run (the x-gather locality lever)."""
    monkeypatch.setenv("NEQUIP_RELAYOUT_SRC_SORT", "1")
    data = _synthetic_stream(seed=5)
    out = relayout_edge_stream(data)
    lay = out[layout_key()]
    assert lay["take_idx"] is None
    assert _masked_edge_multiset(out) == _masked_edge_multiset(data)
    new_dst = np.asarray(out[_keys.EDGE_INDEX_KEY][0])
    new_src = np.asarray(out[_keys.EDGE_INDEX_KEY][1])
    m = np.asarray(out[_keys.EDGE_MASK_KEY])
    rel = np.asarray(lay["rel_dst"])
    assert np.all(rel[~m] == -1) and np.all(rel[m] >= 0)
    # tiles stay contiguous and ascending (the one-hot scatter's only need)
    tile = new_dst // DEFAULT_ROWS
    assert np.all(np.diff(tile) >= 0)
    # within each tile, live srcs ascend (padding self-edges on the tile's
    # last node may interleave key-wise — the backward's bwd_block_e
    # re-chunk then pays its argsort at layout-BUILD time, not per step)
    for t in np.unique(tile):
        s = new_src[(tile == t) & m]
        assert np.all(np.diff(s) >= 0), f"tile {t} src run not ascending"
    # rel_dst consistent with the permuted dst stream on live slots
    tiles = np.repeat(np.asarray(lay["chunk_tile"]), DEFAULT_BLOCK_E)
    assert np.all(new_dst[m] == tiles[m] * DEFAULT_ROWS + rel[m])


def test_src_sort_model_parity(monkeypatch):
    """Pallas model with the src-sorted relayout == XLA model (E/F/grads)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _example_model_and_batch

    monkeypatch.setenv("NEQUIP_RELAYOUT_SRC_SORT", "1")
    m_x, p_x, d_x = _example_model_and_batch(n_atoms=108, tp_impl="xla")
    m_p, p_p, d_p = _example_model_and_batch(n_atoms=108, tp_impl="pallas")
    out_x = m_x(p_x, d_x)
    out_p = m_p(p_p, d_p)
    np.testing.assert_allclose(
        np.asarray(out_p[_keys.TOTAL_ENERGY_KEY]),
        np.asarray(out_x[_keys.TOTAL_ENERGY_KEY]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_p[_keys.FORCE_KEY]),
        np.asarray(out_x[_keys.FORCE_KEY]),
        rtol=1e-4, atol=1e-5,
    )
    rng = np.random.RandomState(7)
    v_f = jnp.asarray(rng.standard_normal(d_x[_keys.POSITIONS_KEY].shape))

    def loss(model, params, data):
        out = model(params, data)
        nm = data[_keys.NODE_MASK_KEY][:, None]
        return (
            jnp.sum(out[_keys.TOTAL_ENERGY_KEY])
            + jnp.sum(jnp.where(nm, out[_keys.FORCE_KEY] * v_f, 0.0))
        )

    g_x = jax.grad(lambda p: loss(m_x, p, d_x))(p_x)
    g_p = jax.grad(lambda p: loss(m_p, p, d_p))(p_p)
    flat_x, _ = jax.flatten_util.ravel_pytree(g_x)
    flat_p, _ = jax.flatten_util.ravel_pytree(g_p)
    scale = np.maximum(np.abs(np.asarray(flat_x)).max(), 1e-30)
    np.testing.assert_allclose(
        np.asarray(flat_p) / scale, np.asarray(flat_x) / scale, atol=2e-4
    )


def test_fr_equals_rr_on_relaid_stream(model_pair):
    _, (m_p, p_p, d_p) = model_pair
    fso = m_p.model
    rng = np.random.RandomState(11)
    v = {
        _keys.FORCE_KEY: jnp.asarray(
            rng.standard_normal(d_p[_keys.POSITIONS_KEY].shape), jnp.float32
        )
        * jnp.asarray(np.asarray(d_p[_keys.NODE_MASK_KEY])[:, None]),
    }
    inputs = {k: d_p[k] for k in m_p.input_fields if k in d_p}
    inputs.update({k: x for k, x in d_p.items() if k.startswith("__edge_layout_")})
    relaid = relayout_edge_stream(inputs)
    assert relaid[layout_key()]["take_idx"] is None

    def rr_loss(p):
        out = m_p(p, d_p)
        return jnp.sum(out[_keys.FORCE_KEY] * v[_keys.FORCE_KEY])

    g_rr = jax.grad(rr_loss)(p_p)
    g_fr = jax.grad(lambda p: fso.loss_surrogate(p, relaid, v))(p_p)
    flat_rr, _ = jax.flatten_util.ravel_pytree(g_rr)
    flat_fr, _ = jax.flatten_util.ravel_pytree(g_fr)
    scale = np.maximum(np.abs(np.asarray(flat_rr)).max(), 1e-30)
    np.testing.assert_allclose(
        np.asarray(flat_fr) / scale, np.asarray(flat_rr) / scale, atol=1e-5
    )


@pytest.mark.parametrize("src_sort", ["0", "1"])
def test_attach_host_fast_path_matches_jnp(monkeypatch, src_sort):
    """attach_edge_layouts computes layouts in pure numpy on concrete inputs
    (eager jnp pays ~28 ms dispatch RTT per op on a tunneled TPU — ~120 s
    per attach at 900k edges — and ~13 s even on CPU); the numpy twin
    (_layout_edges_np / _compute_edge_layout_np) must produce exactly the
    traced jnp path's layouts, in both edge orderings."""
    monkeypatch.setenv("NEQUIP_RELAYOUT_SRC_SORT", src_sort)
    data = _synthetic_stream()
    fast = attach_edge_layouts(data)  # concrete inputs -> numpy twin
    # fresh lambda per param: jax.jit caches traces on the wrapped function
    # OBJECT, and SRC_SORT is a trace-time gate — jitting attach_edge_layouts
    # directly would silently reuse the other param's trace
    traced = jax.jit(lambda d: attach_edge_layouts(d))(data)
    key = layout_key()
    assert key in fast
    flat_fast, _ = jax.tree.flatten(fast[key])
    flat_traced, _ = jax.tree.flatten(traced[key])
    assert len(flat_fast) == len(flat_traced)
    for a, b in zip(flat_fast, flat_traced):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
