"""Fused gather -> CG tensor-product -> scatter Pallas TPU kernel.

The TPU-native equivalent of the reference's OpenEquivariance/cuEquivariance
fused CUDA kernels (``/root/reference/nequip/nn/_tp_scatter_oeq.py``,
``_tp_scatter_cueq.py``): the hottest op in the network computed without
materializing the ``[E, mid_dim]`` message tensor in HBM and without XLA's
slow scatter-add.

Design (see ``/opt/skills/guides/pallas_guide.md`` patterns):

* edges are laid out **sorted by destination node** and re-packed so that the
  edge segment of every ROWS-row *node tile* is BLOCK_E-aligned (host/XLA
  prep, pure jnp, one gather);
* the kernel iterates over edge chunks; consecutive chunks that target the
  same node tile keep the output tile resident in VMEM and accumulate into
  it (flash-attention-style revisiting, ``chunk_first`` resets);
* the CG contraction is unrolled as elementwise multiply-adds over
  ``[BLOCK_E, mul]`` column blocks (ir_mul layout makes every CG term a
  scaled columnwise product — VPU-friendly, no in-kernel reshapes);
* the scatter becomes a **one-hot matmul on the MXU**:
  ``out_tile += S @ msg`` with ``S[r, e] = (rel_dst[e] == r)``.

Masked (padded) edges carry zero radial weights, so every path's message
vanishes exactly; padding slots introduced by the tile alignment get
``rel_dst = -1`` and never hit a row of S.

The public entry ``fused_tp_scatter`` is a ``jax.custom_vjp``: the forward
runs this kernel; the backward is a native Pallas kernel producing per-edge
cotangents tile-by-tile.  The backward is itself a ``custom_vjp`` whose VJP
is written in terms of the forward and backward kernels (the trilinear
family is closed under differentiation — see ``_make_fused_uncached``), so
reverse-over-reverse AD (force-loss *training*) also runs fully fused.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cg import cg_component_normalized
from ..tensor_product import TensorProduct

# tile sizes are env-tunable for hardware sweeps (bench.py single-case mode):
# ROWS = node-tile height (output rows resident in VMEM), BLOCK_E = edges per
# chunk (gather/matmul width).  The r4 calibration (bench.py run_calib)
# showed the tunneled chip delivers near-datasheet compute — defaults were
# swept on real hardware; re-sweep via NEQUIP_PALLAS_ROWS /
# NEQUIP_PALLAS_BLOCK_E when the model shape changes.
import os as _os

DEFAULT_ROWS = int(_os.environ.get("NEQUIP_PALLAS_ROWS", 128))
DEFAULT_BLOCK_E = int(_os.environ.get("NEQUIP_PALLAS_BLOCK_E", 256))

# CG compute layout inside the kernels (import-time):
#   "row"    — [BLOCK_E, mul] column ops (mul on lanes; pays ~4x lane padding
#              at mul=32, see ROUND2_NOTES);
#   "elanes" — transposed [mul, BLOCK_E] ops (edges on lanes, mul on
#              sublanes; fully packed vregs for mul % 8 == 0, at the cost of
#              per-chunk in-kernel transposes of the streamed blocks).
_LAYOUT = _os.environ.get("NEQUIP_PALLAS_LAYOUT", "elanes")
if _LAYOUT not in ("row", "elanes"):
    raise ValueError(
        f"NEQUIP_PALLAS_LAYOUT={_LAYOUT!r}: must be 'row' or 'elanes'"
    )
_TRANSPOSED = _LAYOUT == "elanes"


# read ONCE at import time (changing the env var later has no effect);
# validated here so typos fail loudly instead of silently running HIGHEST
_F32_PRECISION = _os.environ.get("NEQUIP_PALLAS_F32_PRECISION", "highest")
if _F32_PRECISION not in ("highest", "default"):
    raise ValueError(
        f"NEQUIP_PALLAS_F32_PRECISION={_F32_PRECISION!r}: must be 'highest' "
        "(bf16x6 passes, full f32 fidelity) or 'default' (bf16x3, ~1e-6 rel)"
    )


# step-time attribution probes (trace-time, NUMERICALLY WRONG results —
# measurement only): comma list of gather sites to replace with a contiguous
# stream copy of the same shape, isolating each site's row-gather cost.
# Tokens: "xfwd" (forward x_lay), "xbwd" (backward-kernel x_lay), "dxre"
# (the dx-scatter's reorder-into-layout gather).
_ABLATE_GATHER = frozenset(
    t for t in _os.environ.get("NEQUIP_ABLATE_GATHER", "").split(",") if t
)


def _ablated_take(tag, a, idx):
    """``_take_ib(a, idx, axis=0)``, or a gather-free stream copy when the
    site ``tag`` is ablated via ``NEQUIP_ABLATE_GATHER`` (attribution A/Bs
    on the real chip; see ROUND4_NOTES.md)."""
    if tag in _ABLATE_GATHER:
        M = idx.shape[0]
        if M == a.shape[0]:
            return a  # permute site: identity is the exact gather-free form
        # expand site: a zeros stream costs one sequential write (~1.5 ms at
        # 23k) vs the gather's random-row read — the cheapest same-shape stand-in
        return jnp.zeros((M, a.shape[1]), a.dtype)
    return _take_ib(a, idx, axis=0)


def _mxu_precision(dtype):
    """MXU pass policy for the kernels' matmuls.

    f64 always runs HIGHEST.  For f32 operands the policy is env-tunable
    (``NEQUIP_PALLAS_F32_PRECISION=highest|default``): HIGHEST is bf16x6
    passes (full f32 fidelity, ~14 TF/s on v5e), DEFAULT is bf16x3
    (~1e-6 relative error, ~22 TF/s) — Mosaic supports only these two.
    bf16 operands use DEFAULT (native MXU).
    """
    if dtype == jnp.float64:
        return jax.lax.Precision.HIGHEST
    if dtype == jnp.float32:
        if _F32_PRECISION == "default":
            return jax.lax.Precision.DEFAULT
        # follow the framework's TF32 toggle (utils/global_state.py) so
        # "fast-math" mode is coherent across XLA einsums and kernels
        from ...utils.global_state import tf32_enabled

        if tf32_enabled():
            return jax.lax.Precision.DEFAULT
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def _acc_dtype(dtype):
    """Matmul accumulator dtype: at least 32-bit (Mosaic requirement), but
    never narrower than the operand dtype (keeps f64 test parity)."""
    return jnp.float32 if jnp.dtype(dtype).itemsize < 4 else dtype


# ---------------------------------------------------------------------------
# static kernel plan derived from the TensorProduct spec
# ---------------------------------------------------------------------------
class _TPPlan:
    def __init__(self, tp: TensorProduct):
        self.dim_in = tp.irreps_in1.dim
        self.sh_dim = tp.irreps_in2.dim
        self.mid_dim = tp.irreps_out.dim
        self.weight_numel = tp.weight_numel

        sl1 = tp.irreps_in1.slices()
        sl2 = tp.irreps_in2.slices()
        sl3 = tp.irreps_out.slices()

        # per instruction: static offsets + nonzero CG terms
        self.paths = []
        for idx, ins in enumerate(tp.instructions):
            assert ins.mode == "uvu" and ins.has_weight, (
                "fused kernel supports the conv 'uvu' TP only"
            )
            mi1 = tp.irreps_in1[ins.i_in1]
            mi2 = tp.irreps_in2[ins.i_in2]
            mi3 = tp.irreps_out[ins.i_out]
            assert mi2.mul == 1, "edge attrs (SH) must have multiplicity 1"
            assert mi3.mul == mi1.mul
            cg = cg_component_normalized(mi1.ir.l, mi2.ir.l, mi3.ir.l)
            terms = [
                (int(m1), int(m2), int(m3), float(cg[m1, m2, m3]) * ins.path_weight)
                for m1 in range(mi1.ir.dim)
                for m2 in range(mi2.ir.dim)
                for m3 in range(mi3.ir.dim)
                if abs(cg[m1, m2, m3]) > 1e-12
            ]
            self.paths.append(
                dict(
                    x_off=sl1[ins.i_in1].start,
                    y_off=sl2[ins.i_in2].start,
                    out_off=sl3[ins.i_out].start,
                    mul=mi1.mul,
                    dim1=mi1.ir.dim,
                    dim3=mi3.ir.dim,
                    w_sl=tp._weight_slices[idx],
                    terms=terms,
                )
            )


def _compute_tp_block(plan: _TPPlan, x, y, w, msg_ref):
    """Write msg [BLOCK_E, mid_dim] into the VMEM scratch ``msg_ref``.

    Accumulating in-place into one scratch buffer keeps Mosaic's scoped-VMEM
    stack small (a dict of live column accumulators blew the 16M limit).
    Per output column block, the sum over CG terms is built as one expression
    so each [B, mul] write happens exactly once.
    """
    msg_ref[:] = jnp.zeros_like(msg_ref)
    for p in plan.paths:
        mul = p["mul"]
        wp = w[:, p["w_sl"]]
        xw_cache = {}
        # group terms by output m3 so each column block is written once
        by_m3 = {}
        for m1, m2, m3, c in p["terms"]:
            by_m3.setdefault(m3, []).append((m1, m2, c))
        for m3, terms in by_m3.items():
            acc = None
            for m1, m2, c in terms:
                if m1 not in xw_cache:
                    off = p["x_off"] + m1 * mul
                    xw_cache[m1] = x[:, off : off + mul] * wp
                yv = y[:, p["y_off"] + m2 : p["y_off"] + m2 + 1]
                t = (c * yv) * xw_cache[m1]
                acc = t if acc is None else acc + t
            col = p["out_off"] + m3 * mul
            msg_ref[:, col : col + mul] += acc.astype(msg_ref.dtype)


def _compute_tp_block_T(plan: _TPPlan, x_t, y_t, w_t, msg_ref_t):
    """Transposed CG contraction: operands/outputs are [dim, BLOCK_E].

    Lane-occupancy fix for small multiplicities (ROUND2_NOTES: at mul=32 the
    row-major [BLOCK_E, mul] column ops leave 3/4 of the VPU's 128 lanes
    idle).  With edges on lanes and mul on sublanes every CG term is a
    [mul, BLOCK_E] elementwise op — fully packed vregs for any mul that is a
    multiple of 8.  The per-edge SH component becomes a [1, BLOCK_E] row
    broadcast across sublanes (native on TPU).
    """
    msg_ref_t[:] = jnp.zeros_like(msg_ref_t)
    for p in plan.paths:
        mul = p["mul"]
        wp = w_t[p["w_sl"], :]
        xw_cache = {}
        by_m3 = {}
        for m1, m2, m3, c in p["terms"]:
            by_m3.setdefault(m3, []).append((m1, m2, c))
        for m3, terms in by_m3.items():
            acc = None
            for m1, m2, c in terms:
                if m1 not in xw_cache:
                    off = p["x_off"] + m1 * mul
                    xw_cache[m1] = x_t[off : off + mul, :] * wp
                yv = y_t[p["y_off"] + m2 : p["y_off"] + m2 + 1, :]
                t = (c * yv) * xw_cache[m1]
                acc = t if acc is None else acc + t
            row = p["out_off"] + m3 * mul
            msg_ref_t[row : row + mul, :] += acc.astype(msg_ref_t.dtype)


def _compute_tp_bwd_block_T(plan: _TPPlan, x_t, y_t, w_t, ge_t, dx_ref_t, dy_ref_t, dw_ref_t):
    """Transposed CG-VJP (see ``_compute_tp_bwd_block`` for the algebra):
    all operands [dim, BLOCK_E]; the dy lane-reduction becomes a sublane
    reduction (``sum(axis=0)``), which the VPU does natively."""
    dx_ref_t[:] = jnp.zeros_like(dx_ref_t)
    dy_ref_t[:] = jnp.zeros_like(dy_ref_t)
    dw_rows = {}
    for p in plan.paths:
        mul = p["mul"]
        wp = w_t[p["w_sl"], :]
        by_m3 = {}
        for m1, m2, m3, c in p["terms"]:
            by_m3.setdefault(m3, []).append((m1, m2, c))
        dy_pre = {}  # m2 -> sum_{m1,m3} c * x_m1 * g_m3   (wp factored out)
        dx_pre = {}  # m1 -> sum_{m2,m3} (c*y_m2) * g_m3   (wp factored out)
        for m3, terms in by_m3.items():
            row = p["out_off"] + m3 * mul
            grow = ge_t[row : row + mul, :]
            for m1, m2, c in terms:
                xo = p["x_off"] + m1 * mul
                xrow = x_t[xo : xo + mul, :]
                yv = y_t[p["y_off"] + m2 : p["y_off"] + m2 + 1, :]
                t_y = c * (xrow * grow)
                dy_pre[m2] = t_y if m2 not in dy_pre else dy_pre[m2] + t_y
                t_x = (c * yv) * grow
                dx_pre[m1] = t_x if m1 not in dx_pre else dx_pre[m1] + t_x
        dw_acc = None
        for m2, acc in dy_pre.items():
            yv = y_t[p["y_off"] + m2 : p["y_off"] + m2 + 1, :]
            t_w = yv * acc
            dw_acc = t_w if dw_acc is None else dw_acc + t_w
            dy_ref_t[p["y_off"] + m2 : p["y_off"] + m2 + 1, :] += jnp.sum(
                wp * acc, axis=0, keepdims=True
            )
        for m1, acc in dx_pre.items():
            xo = p["x_off"] + m1 * mul
            dx_ref_t[xo : xo + mul, :] += wp * acc
        dw_rows[p["w_sl"].start] = (p["w_sl"], dw_acc)
    pos_ = 0
    for start in sorted(dw_rows):
        sl, acc = dw_rows[start]
        if sl.start > pos_:  # gap between weighted paths (none for uvu TPs)
            dw_ref_t[pos_ : sl.start, :] = jnp.zeros(
                (sl.start - pos_, x_t.shape[1]), dtype=dw_ref_t.dtype
            )
        dw_ref_t[sl, :] = acc.astype(dw_ref_t.dtype)
        pos_ = sl.stop
    if pos_ < plan.weight_numel:
        dw_ref_t[pos_ :, :] = jnp.zeros(
            (plan.weight_numel - pos_, x_t.shape[1]), dtype=dw_ref_t.dtype
        )


# ---------------------------------------------------------------------------
# edge re-layout: dst-sorted, tile-aligned chunks
# ---------------------------------------------------------------------------
def layout_key(rows: int = None, block_e: int = None) -> str:
    """Data-dict key under which a precomputed edge layout is stored.

    The layout is a pure function of (edge_dst, num_nodes, rows, block_e) —
    NOT of positions — so MD drivers compute it once per neighborlist
    rebuild instead of paying the argsort/scan on every step
    (``integrations/md.py``), and static-graph inference pays it once ever.
    """
    rows = DEFAULT_ROWS if rows is None else rows
    block_e = DEFAULT_BLOCK_E if block_e is None else block_e
    return f"__edge_layout_{rows}x{block_e}"


def attach_edge_layouts(data, with_backward: bool = True):
    """Return ``data`` with precomputed fused-kernel edge layouts attached.

    Call after every neighborlist (re)build — MD drivers, the pair-style
    wrapper, and static-graph benchmarks — so the per-step argsort/scan
    prep leaves the hot loop.  Jittable (pure jnp).  ``with_backward`` also
    attaches the layout used by the MLP-fused backward kernel (needed
    whenever forces are computed, i.e. almost always).
    """
    from ...data import _keys  # local import: ops must stay data-agnostic

    edge_dst = data[_keys.EDGE_INDEX_KEY][0]
    edge_src = data[_keys.EDGE_INDEX_KEY][1]
    edge_mask = data.get(_keys.EDGE_MASK_KEY)
    if edge_mask is None:
        edge_mask = jnp.ones_like(edge_dst, dtype=bool)
    # node capacity from positions, or the node mask when positions are
    # stripped (MD drivers pass a positions-less "batch rest")
    if _keys.POSITIONS_KEY in data:
        num_nodes = data[_keys.POSITIONS_KEY].shape[0]
    else:
        num_nodes = data[_keys.NODE_MASK_KEY].shape[0]
    out = dict(data)
    combos = [(DEFAULT_ROWS, DEFAULT_BLOCK_E)]
    if with_backward and bwd_block_e() != DEFAULT_BLOCK_E:
        combos.append((DEFAULT_ROWS, bwd_block_e()))

    # Concrete (untraced) inputs: compute the layouts in PURE NUMPY on the
    # host and ship the finished arrays in one device_put.  The pure-jnp
    # path dispatches dozens of tiny ops; on a tunneled TPU runtime each
    # eager op pays the ~28 ms dispatch RTT (~120 s per attach at 900k
    # edges, tools/md_case_attribution.py), and even eager jnp-on-CPU costs
    # ~13 s — numpy does the same work in well under a second, which is what
    # makes per-step skin rebuilds affordable in the MD hot loop.  Traced
    # inputs (the in-graph MD rebuild path) keep the jnp path below; the two
    # implementations are pinned equal by
    # tests/unit/ops/test_relayout.py::test_attach_host_fast_path_matches_jnp.
    is_concrete = not isinstance(edge_dst, jax.core.Tracer)
    if is_concrete:
        ed = np.asarray(edge_dst)
        es = np.asarray(edge_src)
        em = np.asarray(edge_mask)
        for rows, block_e in combos:
            if num_nodes % rows != 0:
                continue
            lay = _compute_edge_layout_np(
                ed, es, em, num_nodes, rows, block_e, with_dx=True
            )
            # one batched transfer to the default device so the hot loop
            # never re-ships host arrays per call
            out[layout_key(rows, block_e)] = jax.device_put(lay)
        return out

    for rows, block_e in combos:
        if num_nodes % rows != 0:
            continue  # capacity not tile-aligned: kernels fall back in-graph
        out[layout_key(rows, block_e)] = compute_edge_layout(
            edge_dst, edge_src, edge_mask, num_nodes, rows, block_e,
            with_dx=True,  # both layouts serve a backward's dx row-scatter
        )
    return out


def compute_edge_layout(
    edge_dst, edge_src, edge_mask, num_nodes, rows=None, block_e=None, with_dx=False
):
    """Precompute the dst-sorted tile-aligned edge layout as a dict of arrays.

    Store the result under ``layout_key(rows, block_e)`` in the data dict and
    the fused kernels will skip their in-graph layout pass.  ``edge_src`` and
    ``edge_mask`` only enter derived quantities (``src_lay``/``wmask``) that
    are pure gathers by ``take_idx``, so the layout stays valid as long as
    the edge list itself is unchanged.

    ``with_dx=True`` additionally precomputes the *source-keyed* layout used
    by the backward's ``dx`` row-scatter kernel (``pallas_scatter_sum`` over
    source nodes), stored under the ``"dx"`` key.
    """
    rows = DEFAULT_ROWS if rows is None else rows
    block_e = DEFAULT_BLOCK_E if block_e is None else block_e
    take_idx, rel_dst, chunk_tile, chunk_first, valid = _layout_edges(
        edge_dst, edge_src, edge_mask, num_nodes, rows, block_e
    )
    lay = {
        "take_idx": take_idx,
        "rel_dst": rel_dst,
        "chunk_tile": chunk_tile,
        "chunk_first": chunk_first,
        "valid": valid,
        # staleness guard: a layout silently mis-permutes messages if the
        # edge list changes under it (shape-compatible, nothing errors), so
        # a cheap order-sensitive checksum of the edges it was built from is
        # carried along and checked in _resolve_layout when
        # NEQUIP_PALLAS_CHECK_LAYOUT=1 (data-side mutators also strip
        # layouts via _keys.EDGE_LAYOUT_KEY_PREFIX)
        "fingerprint": _edge_fingerprint(edge_dst, edge_mask),
    }
    if with_dx:
        E = edge_dst.shape[0]
        safe_idx = jnp.minimum(take_idx, E - 1)
        src_lay = _take_ib(edge_src, safe_idx)
        wm = valid
        if edge_mask is not None:
            wm = wm & _take_ib(edge_mask, safe_idx)
        lay["dx"] = compute_edge_layout(
            src_lay, src_lay, wm, num_nodes, rows, block_e
        )
    return lay


def _edge_fingerprint(edge_dst, edge_mask):
    """Order-sensitive int32 checksum of the (masked) edge-destination list.

    Cheap enough to compute at layout-build time and (under
    ``NEQUIP_PALLAS_CHECK_LAYOUT=1``) at every kernel call; int32 wraparound
    is deterministic on TPU so equal edge lists always agree."""
    e = edge_dst.astype(jnp.int32)
    if edge_mask is not None:
        e = jnp.where(edge_mask, e, -1)
    w = (jnp.arange(e.shape[0], dtype=jnp.int32) % 8191) + 1
    return jnp.sum((e + 2) * w, dtype=jnp.int32)


def _assert_fingerprint(fp_now, fp_layout):
    if int(fp_now) != int(fp_layout):
        raise AssertionError(
            "stale precomputed edge layout: the edge list changed since "
            "attach_edge_layouts() was called (re-attach after every "
            "neighborlist rebuild, or strip __edge_layout_* keys)"
        )


def relayout_edge_stream(data, rows: int = None, block_e: int = None):
    """Rewrite the per-edge stream into kernel layout-slot order.

    Permutes ``edge_index`` / ``edge_mask`` / ``edge_cell_shift`` into the
    dst-sorted tile-aligned slot order (length ``E_pal >= E``) and attaches
    the IDENTITY layout (``take_idx is None``) under ``layout_key()``.  Every
    per-edge tensor computed downstream (SH, radial embedding, radial
    weights) is then *born* in kernel layout order, so the take_idx-keyed
    gathers in ``_forward``/``_backward_kernel_call``/``_layout_and_gather``
    and the ``dy``/``dw`` scatter-backs collapse away entirely.  Measured on
    the v5e tunnel (tools/gather_microbench.py, r4): XLA row gathers run at
    27-41 GB/s against a 400 GB/s stream ceiling — each elided [E, 352]
    radial-weight gather is ~15 ms at 23k atoms.

    Masking moves into the layout: ``rel_dst`` is -1 for masked AND padding
    slots (the one-hot scatter row vanishes, and the backward's ``ge`` —
    hence dx/dy/dw — is exactly zero there), so the kernels also skip their
    defensive ``where`` copies.  This is sound because the padding contract
    (``nn/embedding/edge.py`` head comment) guarantees finite per-edge
    inputs and exactly-zero radial weights at masked slots.

    No-op (returns ``data`` unchanged) when: no edge_index; node capacity is
    not tile-aligned (kernels fall back to XLA); derived per-edge tensors
    are already present (pair-style passes ``edge_vectors``); or the stream
    is already relaid.  Jittable; safe to call per step (when a precomputed
    layout rides along, the residual cost is the small int/shift takes).

    Parity note: the reference's OEQ/cuEq wrappers keep torch's COO edge
    order and pay scatter_sum on every call
    (``/root/reference/nequip/nn/_tp_scatter_oeq.py``); re-laying the edge
    stream once per neighborlist build is the TPU-first replacement.
    """
    from ...data import _keys  # local import: ops must stay data-agnostic

    rows = DEFAULT_ROWS if rows is None else rows
    block_e = DEFAULT_BLOCK_E if block_e is None else block_e
    if _os.environ.get("NEQUIP_RELAYOUT", "1") != "1":
        return data  # A/B kill switch
    if _keys.EDGE_INDEX_KEY not in data:
        return data
    lay = data.get(layout_key(rows, block_e))
    if isinstance(lay, dict) and lay.get("take_idx", 0) is None:
        return data  # already relaid
    for k in (
        _keys.EDGE_VECTORS_KEY,
        _keys.EDGE_LENGTH_KEY,
        _keys.EDGE_ATTRS_KEY,
        _keys.EDGE_EMBEDDING_KEY,
        _keys.EDGE_TRANSPOSE_PERM_KEY,
    ):
        if k in data:
            return data
    if _keys.POSITIONS_KEY in data:
        num_nodes = data[_keys.POSITIONS_KEY].shape[0]
    elif _keys.NODE_MASK_KEY in data:
        num_nodes = data[_keys.NODE_MASK_KEY].shape[0]
    else:
        return data
    if num_nodes % rows != 0:
        return data

    edge_index = data[_keys.EDGE_INDEX_KEY]
    edge_dst, edge_src = edge_index[0], edge_index[1]
    edge_mask = data.get(_keys.EDGE_MASK_KEY)
    em = edge_mask if edge_mask is not None else jnp.ones_like(edge_dst, dtype=bool)
    if lay is not None:
        take_idx, rel_dst, chunk_tile, chunk_first, valid = (
            lay["take_idx"], lay["rel_dst"], lay["chunk_tile"],
            lay["chunk_first"], lay["valid"],
        )
    else:
        take_idx, rel_dst, chunk_tile, chunk_first, valid = _layout_edges(
            edge_dst, edge_src, em, num_nodes, rows, block_e
        )
    E = edge_dst.shape[0]
    safe = jnp.minimum(take_idx, E - 1)
    wmask = valid & _take_ib(em, safe)

    out = dict(data)
    ei_lay = _take_ib(edge_index, safe, axis=1)
    # PADDING slots (no underlying edge) become inert self-edges on the LAST
    # node of their chunk's tile: padding sits at the end of each tile's slot
    # run, so the new dst stream stays globally non-decreasing and any
    # further in-graph layout pass on it (e.g. the MLP-fused backward's
    # re-chunk at bwd_block_e) rides the cheap sortedness fast path instead
    # of a full argsort.  MASKED real edges keep their indices (they were
    # placed by them) — the mask itself neutralizes them everywhere.
    E_pal = take_idx.shape[0]
    pad_node = (jnp.repeat(chunk_tile, block_e) + 1) * rows - 1
    out[_keys.EDGE_INDEX_KEY] = jnp.where(valid[None, :], ei_lay, pad_node[None, :])
    out[_keys.EDGE_MASK_KEY] = wmask
    if _keys.EDGE_CELL_SHIFT_KEY in data:
        shifts = _take_ib(data[_keys.EDGE_CELL_SHIFT_KEY], safe, axis=0)
        out[_keys.EDGE_CELL_SHIFT_KEY] = jnp.where(
            valid[:, None], shifts, jnp.zeros_like(shifts)
        )
    new_dst = out[_keys.EDGE_INDEX_KEY][0]
    new_src = out[_keys.EDGE_INDEX_KEY][1]
    idlay = {
        "take_idx": None,  # static identity marker (None = empty pytree)
        "rel_dst": jnp.where(wmask, rel_dst, -1).astype(jnp.int32),
        "chunk_tile": chunk_tile,
        "chunk_first": chunk_first,
        "valid": wmask,
        "fingerprint": _edge_fingerprint(new_dst, wmask),
        # source-keyed sub-layout for the backward's dx row-scatter; a
        # precomputed layout's "dx" was built from src_lay == new_src, so it
        # is exactly the needed sub-layout — reuse it (MD drivers amortize
        # the src argsort per neighborlist rebuild)
        "dx": (
            lay["dx"]
            if isinstance(lay, dict) and "dx" in lay
            else compute_edge_layout(new_src, new_src, wmask, num_nodes, rows, block_e)
        ),
    }
    out[layout_key(rows, block_e)] = idlay
    be = bwd_block_e(block_e)
    if be != block_e:
        # the MLP-fused backward re-chunks at a smaller block: a real (near-
        # identity) layout of the NEW stream; its take_idx-keyed arrays are
        # the small ones (sh [E,9], emb [E,n_emb])
        out[layout_key(rows, be)] = compute_edge_layout(
            new_dst, new_src, wmask, num_nodes, rows, be, with_dx=True
        )
    return out


def _resolve_layout(edge_dst, edge_src, edge_mask, num_nodes, rows, block_e, layout):
    """Unpack a precomputed layout dict, or compute one in-graph.

    Returns ``take_idx is None`` for an identity (pre-relaid) stream — see
    ``relayout_edge_stream``; callers then skip every take_idx-keyed
    gather/scatter and use ``rel_dst``/``valid`` as-is (mask pre-folded).
    """
    if layout is not None:
        if (
            _os.environ.get("NEQUIP_PALLAS_CHECK_LAYOUT", "0") == "1"
            and "fingerprint" in layout
        ):
            jax.debug.callback(
                _assert_fingerprint,
                _edge_fingerprint(edge_dst, edge_mask),
                layout["fingerprint"],
            )
        return (
            layout["take_idx"],
            layout["rel_dst"],
            layout["chunk_tile"],
            layout["chunk_first"],
            layout["valid"],
        )
    return _layout_edges(edge_dst, edge_src, edge_mask, num_nodes, rows, block_e)


def _layout_edges_np(edge_dst, edge_src, edge_mask, num_nodes, rows, block_e):
    """Pure-numpy twin of ``_layout_edges`` (the attach-time host fast path).

    Must stay semantically identical to the jnp version below — pinned by
    tests/unit/ops/test_relayout.py::test_attach_host_fast_path_matches_jnp.
    """
    E = edge_dst.shape[0]
    T = num_nodes // rows
    iota = np.arange(E, dtype=np.int32)
    if (
        _os.environ.get("NEQUIP_RELAYOUT_SRC_SORT", "0") == "1"
        and edge_src is not None
    ):
        if T * num_nodes < 2**31:
            key = ((edge_dst // rows) * num_nodes + edge_src).astype(np.int32)
            is_sorted = bool(np.all(key[1:] >= key[:-1])) if E > 1 else True
            order = (
                iota if is_sorted else np.argsort(key, kind="stable").astype(np.int32)
            )
        else:
            o1 = np.argsort(edge_src, kind="stable").astype(np.int32)
            o2 = np.argsort(edge_dst[o1] // rows, kind="stable").astype(np.int32)
            order = o1[o2]
    else:
        is_sorted = (
            bool(np.all(edge_dst[1:] >= edge_dst[:-1])) if E > 1 else True
        )
        order = (
            iota
            if is_sorted
            else np.argsort(edge_dst, kind="stable").astype(np.int32)
        )
    dst_sorted = edge_dst[order]
    tile_sorted = dst_sorted // rows

    counts = np.bincount(tile_sorted, minlength=T)[:T].astype(np.int32)
    aligned = np.maximum(((counts + block_e - 1) // block_e) * block_e, block_e)
    aligned_off = np.concatenate(
        [np.zeros(1, aligned.dtype), np.cumsum(aligned)[:-1]]
    )
    tile_edge_off = np.concatenate(
        [np.zeros(1, counts.dtype), np.cumsum(counts)[:-1]]
    )

    E_pal = ((E + T * block_e + block_e - 1) // block_e) * block_e
    G = E_pal // block_e
    if G >= 512:
        G = ((G + 31) // 32) * 32
        E_pal = G * block_e

    idx = np.arange(E, dtype=np.int32)
    pos_in_tile = idx - tile_edge_off[tile_sorted].astype(np.int32)
    new_index = (aligned_off[tile_sorted] + pos_in_tile).astype(np.int32)

    take_idx = np.full((E_pal,), E, dtype=np.int32)
    take_idx[new_index] = order.astype(np.int32)

    valid = take_idx < E
    dst_lay = np.where(valid, edge_dst[np.minimum(take_idx, E - 1)], -1)

    aligned_cum = np.cumsum(aligned)
    chunk_tile = np.searchsorted(
        aligned_cum, np.arange(G, dtype=aligned_cum.dtype) * block_e, side="right"
    ).astype(np.int32)
    chunk_tile = np.minimum(chunk_tile, T - 1)
    chunk_start = np.arange(G, dtype=np.int32) * block_e
    chunk_first = (
        chunk_start == aligned_off[chunk_tile].astype(np.int32)
    ).astype(np.int32)

    rel_dst = np.where(valid, dst_lay - np.repeat(chunk_tile, block_e) * rows, -1)
    return take_idx, rel_dst.astype(np.int32), chunk_tile, chunk_first, valid


def _edge_fingerprint_np(edge_dst, edge_mask):
    """Numpy twin of ``_edge_fingerprint`` (int32 wraparound semantics)."""
    e = edge_dst.astype(np.int32)
    if edge_mask is not None:
        e = np.where(edge_mask, e, np.int32(-1))
    w = ((np.arange(e.shape[0], dtype=np.int32) % 8191) + 1).astype(np.int32)
    with np.errstate(over="ignore"):
        return np.int32(
            np.sum((e + np.int32(2)) * w, dtype=np.int32)
        )


def _compute_edge_layout_np(
    edge_dst, edge_src, edge_mask, num_nodes, rows=None, block_e=None, with_dx=False
):
    """Numpy twin of ``compute_edge_layout`` for attach-time host prep."""
    rows = DEFAULT_ROWS if rows is None else rows
    block_e = DEFAULT_BLOCK_E if block_e is None else block_e
    take_idx, rel_dst, chunk_tile, chunk_first, valid = _layout_edges_np(
        edge_dst, edge_src, edge_mask, num_nodes, rows, block_e
    )
    lay = {
        "take_idx": take_idx,
        "rel_dst": rel_dst,
        "chunk_tile": chunk_tile,
        "chunk_first": chunk_first,
        "valid": valid,
        "fingerprint": _edge_fingerprint_np(edge_dst, edge_mask),
    }
    if with_dx:
        E = edge_dst.shape[0]
        safe_idx = np.minimum(take_idx, E - 1)
        src_lay = edge_src[safe_idx]
        wm = valid
        if edge_mask is not None:
            wm = wm & edge_mask[safe_idx]
        lay["dx"] = _compute_edge_layout_np(
            src_lay, src_lay, wm, num_nodes, rows, block_e
        )
    return lay


def _layout_edges(edge_dst, edge_src, edge_mask, num_nodes, rows, block_e):
    """Returns (take_idx [E_pal], rel_dst [E_pal], chunk_tile [G], chunk_first [G]).

    ``take_idx`` maps packed slots to original edge ids (== E for padding
    slots).  Every node tile owns an integer number of BLOCK_E chunks (>= 1).
    """
    E = edge_dst.shape[0]
    T = num_nodes // rows
    iota = jnp.arange(E, dtype=jnp.int32)
    if (
        _os.environ.get("NEQUIP_RELAYOUT_SRC_SORT", "0") == "1"
        and edge_src is not None
    ):
        # Within-tile src sort: the one-hot dst scatter is order-agnostic
        # inside a node tile (``rel_dst`` carries each slot's row), so order
        # each tile's edge run by ascending src — every downstream x gather
        # (``x_lay`` forward/backward, the fr tangent gathers) then reads
        # node rows near-sequentially instead of randomly.  Composite key
        # (dst_tile, src); two-pass stable argsort when the single int32 key
        # would overflow (>~1M nodes).  Opt-in (layout-build-time cost: a
        # full argsort instead of the sortedness fast path).
        if T * num_nodes < 2**31:
            key = (edge_dst // rows) * num_nodes + edge_src
            is_sorted = jnp.all(key[1:] >= key[:-1]) if E > 1 else jnp.bool_(True)
            order = jax.lax.cond(
                is_sorted,
                lambda: iota,
                lambda: jnp.argsort(key, stable=True).astype(jnp.int32),
            )
        else:
            o1 = jnp.argsort(edge_src, stable=True).astype(jnp.int32)
            o2 = jnp.argsort(
                _take_ib(edge_dst, o1) // rows, stable=True
            ).astype(jnp.int32)
            order = _take_ib(o1, o2)
    else:
        # Both neighborlist backends emit edges center-major (host C++ loops
        # over centers, csrc/neighborlist.cpp:230; the device cell list fills
        # slot i*k_max+k with dst=i even for masked slots), so edge_dst is
        # usually already non-decreasing and the stable argsort is the
        # identity.  A million-edge argsort is seconds-slow on TPU (bitonic
        # network), so detect sortedness at runtime and lax.cond it away —
        # bit-identical, because stable argsort of a sorted array IS iota.
        is_sorted = (
            jnp.all(edge_dst[1:] >= edge_dst[:-1]) if E > 1 else jnp.bool_(True)
        )
        order = jax.lax.cond(
            is_sorted,
            lambda: iota,
            lambda: jnp.argsort(edge_dst, stable=True).astype(jnp.int32),
        )
    dst_sorted = _take_ib(edge_dst, order)
    tile_sorted = dst_sorted // rows

    counts = jax.ops.segment_sum(jnp.ones_like(dst_sorted), tile_sorted, num_segments=T)
    aligned = jnp.maximum(((counts + block_e - 1) // block_e) * block_e, block_e)
    aligned_off = jnp.concatenate([jnp.zeros(1, aligned.dtype), jnp.cumsum(aligned)[:-1]])
    tile_edge_off = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(counts)[:-1]])

    # static upper bound on sum(aligned), rounded to a whole number of chunks
    E_pal = ((E + T * block_e + block_e - 1) // block_e) * block_e
    G = E_pal // block_e
    if G >= 512:
        # keep big streams' chunk count divisible by powers of two (<= 32) so
        # the edge-chunked fr sweep (NEQUIP_FR_EDGE_CHUNKS) never silently
        # falls back on an awkward G (at 100k atoms the natural G = 8438 =
        # 2 x 4219 with 4219 prime).  The extra chunks are inert: all slots
        # invalid (rel_dst = -1), assigned to the last tile, chunk_first = 0.
        G = ((G + 31) // 32) * 32
        E_pal = G * block_e

    idx = jnp.arange(E, dtype=jnp.int32)
    pos_in_tile = idx - _take_ib(tile_edge_off, tile_sorted).astype(jnp.int32)
    new_index = (_take_ib(aligned_off, tile_sorted) + pos_in_tile).astype(jnp.int32)

    take_idx = jnp.full((E_pal,), E, dtype=jnp.int32)
    take_idx = take_idx.at[new_index].set(order.astype(jnp.int32))

    valid = take_idx < E
    dst_lay = jnp.where(valid, _take_ib(edge_dst, jnp.minimum(take_idx, E - 1)), -1)

    slot_tile = jnp.arange(E_pal, dtype=jnp.int32) // block_e
    aligned_cum = jnp.cumsum(aligned)
    chunk_tile = jnp.searchsorted(
        aligned_cum, jnp.arange(G, dtype=aligned_cum.dtype) * block_e, side="right"
    ).astype(jnp.int32)
    chunk_tile = jnp.minimum(chunk_tile, T - 1)
    chunk_start = jnp.arange(G, dtype=jnp.int32) * block_e
    chunk_first = (
        chunk_start == _take_ib(aligned_off, chunk_tile).astype(jnp.int32)
    ).astype(jnp.int32)

    rel_dst = jnp.where(valid, dst_lay - chunk_tile.repeat(block_e) * rows, -1)
    return take_idx, rel_dst.astype(jnp.int32), chunk_tile, chunk_first, valid


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------
def _kernel(plan: _TPPlan, rows, block_e, ct_ref, cf_ref, x_ref, y_ref, w_ref, rel_ref, out_ref, msg_ref):
    g = pl.program_id(0)

    @pl.when(cf_ref[g] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    _kernel_compute(plan, rows, block_e, x_ref, y_ref, w_ref, rel_ref, out_ref, msg_ref)


def _kernel_from_acc(
    plan: _TPPlan, rows, block_e,
    ct_ref, cf_ref, x_ref, y_ref, w_ref, rel_ref, acc_ref, out_ref, msg_ref,
):
    """Accumulating variant: a tile's first chunk initializes the output
    block from ``acc`` instead of zeros, so the call computes
    ``acc + scatter(TP(...))`` without a separate [N, mid] add.  Used by the
    edge-chunked fr sweep (``chunked_jvp_conv``) where slices of the edge
    stream fold into one running accumulator (a boundary tile's continuation
    chunk re-enters through ``acc``, which already holds the previous
    slice's partial sum)."""
    g = pl.program_id(0)

    @pl.when(cf_ref[g] == 1)
    def _():
        out_ref[:] = acc_ref[:]

    _kernel_compute(plan, rows, block_e, x_ref, y_ref, w_ref, rel_ref, out_ref, msg_ref)


def _kernel_compute(plan: _TPPlan, rows, block_e, x_ref, y_ref, w_ref, rel_ref, out_ref, msg_ref):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_e, rows), 1)
    S = (row_ids == rel_ref[:]).astype(out_ref.dtype)
    if _TRANSPOSED:
        # lane-packed CG: transpose the streamed blocks so mul sits on
        # sublanes and edges on lanes, then contract the edge dim of the
        # one-hot directly against msg_t (no transpose back needed)
        _compute_tp_block_T(plan, x_ref[:].T, y_ref[:].T, w_ref[:].T, msg_ref)
        out_ref[:] += jax.lax.dot_general(
            S, msg_ref[:], dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=_acc_dtype(msg_ref.dtype),
            precision=_mxu_precision(msg_ref.dtype),
        ).astype(out_ref.dtype)
        return

    _compute_tp_block(plan, x_ref[:], y_ref[:], w_ref[:], msg_ref)
    # one-hot scatter as an MXU matmul: S[e, r] = (rel_dst[e] == r), then
    # out_tile += S^T @ msg (contraction over the edge dimension)
    out_ref[:] += jax.lax.dot_general(
        S, msg_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=_acc_dtype(msg_ref.dtype),
        precision=_mxu_precision(msg_ref.dtype),
    ).astype(out_ref.dtype)


def _forward(
    tp: TensorProduct,
    x,
    edge_attr,
    edge_weight,
    edge_dst,
    edge_src,
    edge_mask,
    num_nodes: int,
    rows: int = DEFAULT_ROWS,
    block_e: int = DEFAULT_BLOCK_E,
    layout=None,
    acc=None,
):
    plan = _TPPlan(tp)
    E = edge_dst.shape[0]
    assert num_nodes % rows == 0, (
        f"node capacity {num_nodes} must be a multiple of {rows} for the "
        "fused kernel (set the loader pad_multiple accordingly)"
    )

    take_idx, rel_dst, chunk_tile, chunk_first, valid = _resolve_layout(
        edge_dst, edge_src, edge_mask, num_nodes, rows, block_e, layout
    )
    if take_idx is None:
        # identity (pre-relaid) stream: per-edge inputs already sit in slot
        # order, mask folded into rel_dst (-1 rows scatter nothing) — no
        # gathers, no defensive where-copies
        E_pal = edge_dst.shape[0]
        x_lay = _ablated_take("xfwd", x, edge_src)
        y_lay, w_lay = edge_attr, edge_weight
    else:
        E_pal = take_idx.shape[0]
        safe_idx = jnp.minimum(take_idx, E - 1)
        src_lay = _take_ib(edge_src, safe_idx)
        x_lay = _take_ib(x, src_lay, axis=0)
        y_lay = _take_ib(edge_attr, safe_idx, axis=0)
        w_lay = _take_ib(edge_weight, safe_idx, axis=0)
        wmask = valid
        if edge_mask is not None:
            wmask = wmask & _take_ib(edge_mask, safe_idx)
        # zero radial weights kill every path's message for masked/padding slots
        w_lay = jnp.where(wmask[:, None], w_lay, 0)
    G = E_pal // block_e
    rel_2d = rel_dst.reshape(E_pal, 1)

    in_specs = [
        pl.BlockSpec((block_e, plan.dim_in), lambda g, ct, cf: (g, 0)),
        pl.BlockSpec((block_e, plan.sh_dim), lambda g, ct, cf: (g, 0)),
        pl.BlockSpec((block_e, plan.weight_numel), lambda g, ct, cf: (g, 0)),
        pl.BlockSpec((block_e, 1), lambda g, ct, cf: (g, 0)),
    ]
    operands = [x_lay, y_lay, w_lay, rel_2d]
    interpret = jax.default_backend() == "cpu"
    io_aliases = {}
    if acc is not None:
        in_specs.append(
            pl.BlockSpec((rows, plan.mid_dim), lambda g, ct, cf: (ct[g], 0))
        )
        operands.append(acc)
        # donate acc's buffer to the output (indices count the scalar-prefetch
        # operands; shape/dtype are validated at trace time).  interpret mode
        # (CPU tests) doesn't support aliasing — it only loses the reuse.
        if not interpret:
            io_aliases = {6: 0}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, plan.mid_dim), lambda g, ct, cf: (ct[g], 0)),
        scratch_shapes=[
            pltpu.VMEM(
                (plan.mid_dim, block_e) if _TRANSPOSED else (block_e, plan.mid_dim),
                x.dtype,
            )
        ],
    )
    out = pl.pallas_call(
        partial(_kernel_from_acc if acc is not None else _kernel, plan, rows, block_e),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_nodes, plan.mid_dim), x.dtype),
        # interpret mode on CPU so the test suite exercises the same code path
        interpret=interpret,
        input_output_aliases=io_aliases,
    )(chunk_tile, chunk_first, *operands)
    if acc is not None and not io_aliases:
        # no aliasing (interpret mode): output blocks of tiles the slice never
        # visits are uninitialized — restore them from acc.  With aliasing the
        # output buffer IS acc (XLA inserts a copy if acc is still live), so
        # untouched blocks already hold acc's values.
        r = jnp.arange(num_nodes, dtype=jnp.int32)
        touched = (r >= chunk_tile[0] * rows) & (r < (chunk_tile[-1] + 1) * rows)
        out = jnp.where(touched[:, None], out, acc)
    return out


# ---------------------------------------------------------------------------
# generic row-scatter kernel: sum rows of ``values`` into ``num_rows`` buckets
# via the same dst-sorted tile-aligned layout + one-hot MXU matmul.  Replaces
# XLA's sort-based segment_sum for the large unsorted scatters in the fused
# backward (dx over source nodes: [E_pal, dim_in] -> [N, dim_in]).
# ---------------------------------------------------------------------------
def _scatter_rows_kernel(rows, block_e, ct_ref, cf_ref, v_ref, rel_ref, out_ref):
    g = pl.program_id(0)

    @pl.when(cf_ref[g] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_e, rows), 1)
    S = (row_ids == rel_ref[:]).astype(out_ref.dtype)
    out_ref[:] += jax.lax.dot_general(
        S, v_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=_acc_dtype(v_ref.dtype),
        precision=_mxu_precision(v_ref.dtype),
    ).astype(out_ref.dtype)


_SCATTER_COL_BLOCK = int(_os.environ.get("NEQUIP_PALLAS_SCATTER_COL_BLOCK", 0))
# transient-bytes budget for the gathered copy when col_block is unset (0 =
# adaptive): one pass when it fits, else the fewest equal column passes
_SCATTER_BYTES_BUDGET = float(
    _os.environ.get("NEQUIP_PALLAS_SCATTER_BYTES_BUDGET", 1.2e9)
)


def pallas_scatter_sum(
    values,
    index,
    num_rows: int,
    mask=None,
    rows: int = None,
    block_e: int = None,
    layout=None,
    col_block: int = None,
):
    """``segment_sum(values, index, num_rows)`` as a Pallas one-hot matmul.

    ``values`` is ``[M, D]``, ``index`` ``[M]`` (unsorted); rows with
    ``mask=False`` contribute nothing.  The index layout is a pure function
    of ``index`` — precompute it per neighborlist rebuild with
    ``compute_edge_layout(index, index, mask, num_rows, rows, block_e)`` and
    pass it as ``layout``.  Falls back to the XLA ``segment_sum`` when
    ``num_rows`` is not tile-aligned.

    The gathered-into-layout copy of ``values`` is the transient HBM cost
    (``M_pal x D``); for wide D it is processed in ``col_block``-column
    passes so the peak stays bounded (the 100k-atom backward runs within a
    16 GB chip's headroom).
    """
    rows = DEFAULT_ROWS if rows is None else rows
    block_e = DEFAULT_BLOCK_E if block_e is None else block_e
    col_block = _SCATTER_COL_BLOCK if col_block is None else col_block
    D = values.shape[1]
    if num_rows % rows != 0:
        from ..scatter import scatter_sum

        return scatter_sum(values, index, num_segments=num_rows, mask=mask)
    take_idx, rel_dst, chunk_tile, chunk_first, valid = _resolve_layout(
        index, index, mask, num_rows, rows, block_e, layout
    )
    M = index.shape[0]
    E_pal = take_idx.shape[0]
    G = E_pal // block_e
    safe = jnp.minimum(take_idx, M - 1)
    wm = valid if mask is None else valid & _take_ib(mask, safe)
    # fold the slot mask into rel_dst instead of zeroing the [M_pal, D]
    # values: a slot with rel = -1 matches no one-hot row in the scatter
    # kernel, so it contributes exactly zero — and the elementwise
    # select/broadcast pair XLA would otherwise MATERIALIZE around the
    # custom call (it cannot fuse into Pallas operands; ~1.1 GiB/layer of
    # HBM traffic at 23k, hlo_bytes census r3) disappears.  Gathered
    # values at masked slots are clamped copies of real rows, hence finite.
    rel_2d = jnp.where(wm, rel_dst, -1).reshape(E_pal, 1)

    def one_pass(v_cols):
        d = v_cols.shape[1]
        v_lay = _ablated_take("dxre", v_cols, safe)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((block_e, d), lambda g, ct, cf: (g, 0)),
                pl.BlockSpec((block_e, 1), lambda g, ct, cf: (g, 0)),
            ],
            out_specs=pl.BlockSpec((rows, d), lambda g, ct, cf: (ct[g], 0)),
        )
        return pl.pallas_call(
            partial(_scatter_rows_kernel, rows, block_e),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((num_rows, d), values.dtype),
            interpret=(jax.default_backend() == "cpu"),
        )(chunk_tile, chunk_first, v_lay, rel_2d)

    if col_block == 0:  # adaptive: fewest passes within the bytes budget
        bytes_full = E_pal * D * jnp.dtype(values.dtype).itemsize
        n_passes = max(1, int(np.ceil(bytes_full / _SCATTER_BYTES_BUDGET)))
        col_block = int(np.ceil(D / n_passes))
    if D <= col_block:
        return one_pass(values)
    pieces = [
        one_pass(values[:, c : min(c + col_block, D)])
        for c in range(0, D, col_block)
    ]
    return jnp.concatenate(pieces, axis=1)


_DX_SCATTER = _os.environ.get("NEQUIP_PALLAS_DX_SCATTER", "1") == "1"


def _dx_scatter(dx_lay, src_lay, wmask, num_nodes, rows, block_e, layout):
    """Reduce per-slot ``dx`` cotangents onto source nodes.

    XLA's sort-based segment_sum over ~2M unsorted rows is a major cost of
    the force backward at 100k atoms; the Pallas row-scatter kernel replaces
    it whenever the node capacity is tile-aligned.  The source-keyed
    sub-layout is precomputed per neighborlist rebuild
    (``compute_edge_layout(..., with_dx=True)`` via ``attach_edge_layouts``).
    """
    sub = layout.get("dx") if isinstance(layout, dict) else None
    if _DX_SCATTER and num_nodes % rows == 0 and sub != "segsum":
        return pallas_scatter_sum(
            dx_lay, src_lay, num_nodes, mask=wmask,
            rows=rows, block_e=block_e, layout=sub,
        )
    # "segsum" sentinel: edge-chunked fr slices — a per-slice src argsort
    # in-graph would dominate the step, and the precomputed global dx
    # sub-layout does not slice along the dst-sorted stream
    return jax.ops.segment_sum(
        jnp.where(wmask[:, None], dx_lay, 0), src_lay, num_segments=num_nodes
    )


# ---------------------------------------------------------------------------
# native backward kernel: consumes the output cotangent tile-by-tile,
# producing per-edge cotangents without materializing [E, mid_dim] in HBM
# ---------------------------------------------------------------------------
def _bwd_kernel(
    plan: _TPPlan, rows, block_e,
    ct_ref, cf_ref, x_ref, y_ref, w_ref, rel_ref, g_ref,
    dx_ref, dy_ref, dw_ref, ge_ref,
):
    # g_e[e] = g[dst[e]] via the same one-hot matmul, S [block_e, rows]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_e, rows), 1)
    S = (row_ids == rel_ref[:]).astype(g_ref.dtype)
    ge_ref[:] = jnp.dot(
        S, g_ref[:],
        preferred_element_type=_acc_dtype(g_ref.dtype),
        precision=_mxu_precision(g_ref.dtype),
    ).astype(ge_ref.dtype)

    _compute_tp_bwd_block(
        plan, x_ref[:], y_ref[:], w_ref[:], ge_ref[:], dx_ref, dy_ref, dw_ref
    )


def _bwd_kernel_T(
    plan: _TPPlan, rows, block_e,
    ct_ref, cf_ref, x_ref, y_ref, w_ref, rel_ref, g_ref,
    dx_ref, dy_ref, dw_ref, ge_ref, dxt_scr, dyt_scr, dwt_scr,
):
    """Transposed (edge-on-lanes) backward: the CG-VJP runs on [dim, be]
    blocks; per-edge cotangents are transposed back on write so the XLA-side
    scatter consumers are unchanged."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_e, rows), 1)
    S = (row_ids == rel_ref[:]).astype(g_ref.dtype)
    # ge_t [mid, be]: contract the row dim of g against the row dim of S
    ge_ref[:] = jax.lax.dot_general(
        g_ref[:], S, dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=_acc_dtype(g_ref.dtype),
        precision=_mxu_precision(g_ref.dtype),
    ).astype(ge_ref.dtype)
    _compute_tp_bwd_block_T(
        plan, x_ref[:].T, y_ref[:].T, w_ref[:].T, ge_ref[:],
        dxt_scr, dyt_scr, dwt_scr,
    )
    dx_ref[:] = dxt_scr[:].T
    dy_ref[:] = dyt_scr[:].T
    dw_ref[:] = dwt_scr[:].T


def _backward_kernel_call(
    tp, plan, x, edge_attr, edge_weight, edge_dst, edge_src, edge_mask,
    num_nodes, rows, block_e, g, layout=None,
):
    take_idx, rel_dst, chunk_tile, chunk_first, valid = _resolve_layout(
        edge_dst, edge_src, edge_mask, num_nodes, rows, block_e, layout
    )
    E = edge_dst.shape[0]
    if take_idx is None:
        # identity (pre-relaid) stream: ge is exactly zero at masked/padding
        # slots (rel_dst == -1 zeroes the one-hot row), so dx/dy/dw vanish
        # there analytically — no gathers in, no scatter-backs out
        E_pal = E
        src_lay = edge_src
        x_lay = _ablated_take("xbwd", x, edge_src)
        y_lay, w_lay = edge_attr, edge_weight
        wmask = valid
    else:
        E_pal = take_idx.shape[0]
        safe_idx = jnp.minimum(take_idx, E - 1)
        src_lay = _take_ib(edge_src, safe_idx)
        x_lay = _take_ib(x, src_lay, axis=0)
        y_lay = _take_ib(edge_attr, safe_idx, axis=0)
        w_lay = _take_ib(edge_weight, safe_idx, axis=0)
        wmask = valid
        if edge_mask is not None:
            wmask = wmask & _take_ib(edge_mask, safe_idx)
        w_lay = jnp.where(wmask[:, None], w_lay, 0)
    G = E_pal // block_e
    rel_2d = rel_dst.reshape(E_pal, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((block_e, plan.dim_in), lambda g_, ct, cf: (g_, 0)),
            pl.BlockSpec((block_e, plan.sh_dim), lambda g_, ct, cf: (g_, 0)),
            pl.BlockSpec((block_e, plan.weight_numel), lambda g_, ct, cf: (g_, 0)),
            pl.BlockSpec((block_e, 1), lambda g_, ct, cf: (g_, 0)),
            pl.BlockSpec((rows, plan.mid_dim), lambda g_, ct, cf: (ct[g_], 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_e, plan.dim_in), lambda g_, ct, cf: (g_, 0)),
            pl.BlockSpec((block_e, plan.sh_dim), lambda g_, ct, cf: (g_, 0)),
            pl.BlockSpec((block_e, plan.weight_numel), lambda g_, ct, cf: (g_, 0)),
        ],
        scratch_shapes=(
            [
                pltpu.VMEM((plan.mid_dim, block_e), x.dtype),
                pltpu.VMEM((plan.dim_in, block_e), x.dtype),
                pltpu.VMEM((plan.sh_dim, block_e), x.dtype),
                pltpu.VMEM((plan.weight_numel, block_e), x.dtype),
            ]
            if _TRANSPOSED
            else [pltpu.VMEM((block_e, plan.mid_dim), x.dtype)]
        ),
    )
    dx_lay, dy_lay, dw_lay = pl.pallas_call(
        partial(_bwd_kernel_T if _TRANSPOSED else _bwd_kernel, plan, rows, block_e),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((E_pal, plan.dim_in), x.dtype),
            jax.ShapeDtypeStruct((E_pal, plan.sh_dim), x.dtype),
            jax.ShapeDtypeStruct((E_pal, plan.weight_numel), x.dtype),
        ],
        interpret=(jax.default_backend() == "cpu"),
    )(chunk_tile, chunk_first, x_lay, y_lay, w_lay, rel_2d, g)

    # dx: scatter back over source nodes (masked slots contribute zero since
    # their ge rows are zero)
    dx = _dx_scatter(dx_lay, src_lay, wmask, num_nodes, rows, block_e, layout)
    if take_idx is None:
        # identity stream: per-edge cotangents are already in slot order and
        # exactly zero at masked/padding slots (ge == 0 there)
        return dx, dy_lay, dw_lay
    # dy/dw: map layout slots back to the original edge order; padding slots
    # (take_idx == E) are dropped
    dy = jnp.zeros_like(edge_attr).at[take_idx].set(dy_lay, mode="drop")
    dw_masked = jnp.where(wmask[:, None], dw_lay, 0)
    dw = jnp.zeros_like(edge_weight).at[take_idx].set(dw_masked, mode="drop")
    return dx, dy, dw


# ---------------------------------------------------------------------------
# custom VJP: kernel forward, kernel backward (XLA reference as fallback)
# ---------------------------------------------------------------------------
def _reference(tp, x, edge_attr, edge_weight, edge_dst, edge_src, edge_mask, num_nodes):
    from ..scatter import scatter_sum

    x_src = _take_ib(x, edge_src, axis=0)
    messages = tp(x_src, edge_attr, edge_weight)
    return scatter_sum(messages, edge_dst, num_segments=num_nodes, mask=edge_mask)


# ---------------------------------------------------------------------------
# kernel v2: radial MLP fused into the kernel — the [E, weight_numel] radial
# weights never exist in HBM (the big memory/bandwidth cost at 100k+ atoms)
# ---------------------------------------------------------------------------
def _fwd_mlp_kernel(plan, rows, block_e, alpha0, alpha1,
                    ct_ref, cf_ref, x_ref, y_ref, emb_ref, rel_ref,
                    w1_ref, w2_ref, out_ref, msg_ref, w_ref):
    g = pl.program_id(0)

    @pl.when(cf_ref[g] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # radial MLP in VMEM: [B, n_emb] @ [n_emb, H] -> silu -> @ [H, WN]
    h = jnp.dot(emb_ref[:], w1_ref[:] * alpha0,
                preferred_element_type=_acc_dtype(emb_ref.dtype),
                precision=_mxu_precision(emb_ref.dtype))
    h = jax.nn.silu(h)
    w_ref[:] = jnp.dot(h, w2_ref[:] * alpha1,
                       preferred_element_type=_acc_dtype(emb_ref.dtype),
                       precision=_mxu_precision(emb_ref.dtype)).astype(w_ref.dtype)

    _compute_tp_block(plan, x_ref[:], y_ref[:], w_ref[:], msg_ref)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_e, rows), 1)
    S = (row_ids == rel_ref[:]).astype(out_ref.dtype)
    out_ref[:] += jax.lax.dot_general(
        S, msg_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=_acc_dtype(msg_ref.dtype),
        precision=_mxu_precision(msg_ref.dtype),
    ).astype(out_ref.dtype)


def _fwd_mlp_kernel_T(plan, rows, block_e, alpha0, alpha1,
                      ct_ref, cf_ref, x_ref, y_ref, emb_ref, rel_ref,
                      w1t_ref, w2t_ref, out_ref, msg_ref, w_ref):
    """Transposed fused forward: MLP and CG both run on [dim, be] blocks
    (``w1t``/``w2t`` arrive pre-transposed; the streamed per-edge blocks are
    transposed in-kernel)."""
    g = pl.program_id(0)

    @pl.when(cf_ref[g] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    prec = _mxu_precision(emb_ref.dtype)
    acc = _acc_dtype(emb_ref.dtype)
    # transposed radial MLP: [H, n_emb] @ [n_emb, B] -> silu -> [WN, H] @ [H, B]
    h_t = jnp.dot(w1t_ref[:] * alpha0, emb_ref[:].T,
                  preferred_element_type=acc, precision=prec)
    h_t = jax.nn.silu(h_t)
    w_ref[:] = jnp.dot(w2t_ref[:] * alpha1, h_t,
                       preferred_element_type=acc, precision=prec).astype(w_ref.dtype)

    _compute_tp_block_T(plan, x_ref[:].T, y_ref[:].T, w_ref[:], msg_ref)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_e, rows), 1)
    S = (row_ids == rel_ref[:]).astype(out_ref.dtype)
    out_ref[:] += jax.lax.dot_general(
        S, msg_ref[:], dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=_acc_dtype(msg_ref.dtype),
        precision=_mxu_precision(msg_ref.dtype),
    ).astype(out_ref.dtype)


def _compute_tp_bwd_block(plan, x, y, w, ge, dx_ref, dy_ref, dw_ref):
    """Shared CG-VJP: writes dx/dy/dw refs in place.

    ``dw_ref`` may be an output ref (plain backward kernel) or a VMEM
    scratch (MLP-fused backward); writing path slices directly avoids the
    wide column-concatenate temporary that inflated Mosaic's VMEM
    footprint (and blocked ``block_e=256`` backward compiles).

    The radial weight ``wp`` is constant across a path's CG terms, so it is
    factored out of the dy/dx accumulations: one lane-reduction per *m2*
    (instead of per term) and one wp-multiply per m1/m2 — the VPU-bound
    inner loop does ~5 elementwise ops per term instead of ~7 plus a
    reduction.
    """
    dx_ref[:] = jnp.zeros_like(dx_ref)
    dy_ref[:] = jnp.zeros_like(dy_ref)
    dw_cols = {}
    for p in plan.paths:
        mul = p["mul"]
        wp = w[:, p["w_sl"]]
        by_m3 = {}
        for m1, m2, m3, c in p["terms"]:
            by_m3.setdefault(m3, []).append((m1, m2, c))
        dy_pre = {}  # m2 -> sum_{m1,m3} c * x_m1 * g_m3   (wp factored out)
        dx_pre = {}  # m1 -> sum_{m2,m3} (c*y_m2) * g_m3   (wp factored out)
        for m3, terms in by_m3.items():
            col = p["out_off"] + m3 * mul
            gcol = ge[:, col : col + mul]
            for m1, m2, c in terms:
                xo = p["x_off"] + m1 * mul
                xcol = x[:, xo : xo + mul]
                yv = y[:, p["y_off"] + m2 : p["y_off"] + m2 + 1]
                t_y = c * (xcol * gcol)
                dy_pre[m2] = t_y if m2 not in dy_pre else dy_pre[m2] + t_y
                t_x = (c * yv) * gcol
                dx_pre[m1] = t_x if m1 not in dx_pre else dx_pre[m1] + t_x
        # dw = sum_m2 y_m2 * dy_pre[m2]  (the same accumulators serve both
        # cotangents, saving one [B, mul] multiply-add per CG term)
        dw_acc = None
        for m2, acc in dy_pre.items():
            yv = y[:, p["y_off"] + m2 : p["y_off"] + m2 + 1]
            t_w = yv * acc
            dw_acc = t_w if dw_acc is None else dw_acc + t_w
            dy_ref[:, p["y_off"] + m2 : p["y_off"] + m2 + 1] += jnp.sum(
                wp * acc, axis=1, keepdims=True
            )
        for m1, acc in dx_pre.items():
            xo = p["x_off"] + m1 * mul
            dx_ref[:, xo : xo + mul] += wp * acc
        dw_cols[p["w_sl"].start] = (p["w_sl"], dw_acc)
    pos_ = 0
    for start in sorted(dw_cols):
        sl, acc = dw_cols[start]
        if sl.start > pos_:  # gap between weighted paths (none for uvu TPs)
            dw_ref[:, pos_ : sl.start] = jnp.zeros(
                (x.shape[0], sl.start - pos_), dtype=dw_ref.dtype
            )
        dw_ref[:, sl] = acc.astype(dw_ref.dtype)
        pos_ = sl.stop
    if pos_ < plan.weight_numel:
        dw_ref[:, pos_ :] = jnp.zeros(
            (x.shape[0], plan.weight_numel - pos_), dtype=dw_ref.dtype
        )


def _bwd_mlp_kernel(plan, rows, block_e, alpha0, alpha1,
                    ct_ref, cf_ref, x_ref, y_ref, emb_ref, rel_ref, mask_ref,
                    w1_ref, w2_ref, g_ref,
                    dx_ref, dy_ref, demb_ref, dw1_ref, dw2_ref,
                    ge_ref, dw_scr):
    g = pl.program_id(0)
    f32 = _mxu_precision(g_ref.dtype)

    @pl.when(g == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)

    # gather cotangent rows: g_e = S @ g_tile
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_e, rows), 1)
    S = (row_ids == rel_ref[:]).astype(g_ref.dtype)
    ge_ref[:] = jnp.dot(
        S, g_ref[:], preferred_element_type=_acc_dtype(g_ref.dtype), precision=f32
    ).astype(ge_ref.dtype)

    # recompute radial MLP.  The activation math runs in f32 regardless of
    # the kernel dtype: jax.nn.sigmoid's bf16 lowering materializes f32
    # scalar constants that trip Mosaic's vector.broadcast verifier, and
    # [block_e, H] is small anyway.  Casts happen at the dot boundaries.
    w1a = w1_ref[:] * alpha0
    w2a = w2_ref[:] * alpha1
    emb = emb_ref[:]
    h_pre = jnp.dot(emb, w1a, preferred_element_type=_acc_dtype(emb.dtype), precision=f32)
    h_pre = h_pre.astype(_acc_dtype(emb.dtype))
    sig = jax.nn.sigmoid(h_pre)
    h = (h_pre * sig).astype(emb.dtype)
    w = jnp.dot(h, w2a, preferred_element_type=_acc_dtype(emb.dtype), precision=f32).astype(emb.dtype)

    _compute_tp_bwd_block(plan, x_ref[:], y_ref[:], w, ge_ref[:], dx_ref, dy_ref, dw_scr)
    dw = dw_scr[:] * mask_ref[:]  # kill cotangents of masked/padding slots

    # MLP VJP (accumulated across chunks in the resident dw1/dw2 blocks)
    dh = jnp.dot(dw, w2a.T, preferred_element_type=_acc_dtype(emb.dtype), precision=f32)
    dh = dh.astype(_acc_dtype(emb.dtype))
    # silu' = sig * (1 + x*(1-sig)), computed in f32 like sig itself
    dh_pre = (dh * (sig * (1.0 + h_pre * (1.0 - sig)))).astype(emb.dtype)
    demb_ref[:] = jnp.dot(
        dh_pre, w1a.T, preferred_element_type=_acc_dtype(emb.dtype), precision=f32
    ).astype(demb_ref.dtype)
    dw2_ref[:] += alpha1 * jax.lax.dot_general(
        h, dw, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=_acc_dtype(emb.dtype), precision=f32,
    ).astype(dw2_ref.dtype)
    dw1_ref[:] += alpha0 * jax.lax.dot_general(
        emb, dh_pre, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=_acc_dtype(emb.dtype), precision=f32,
    ).astype(dw1_ref.dtype)


def _bwd_mlp_kernel_T(plan, rows, block_e, alpha0, alpha1,
                      ct_ref, cf_ref, x_ref, y_ref, emb_ref, rel_ref, mask_ref,
                      w1t_ref, w2t_ref, g_ref,
                      dx_ref, dy_ref, demb_ref, dw1_ref, dw2_ref,
                      ge_ref, dw_scr, dxt_scr, dyt_scr):
    """Transposed fused backward (see ``_bwd_mlp_kernel`` for the algebra):
    the CG-VJP and MLP-VJP run on [dim, be] blocks; per-edge cotangents are
    transposed back on write.  The MLP-VJP matmuls contract the edge (lane)
    dimension directly, so dw1/dw2 accumulate in their original orientation
    with no extra transposes."""
    g = pl.program_id(0)
    prec = _mxu_precision(g_ref.dtype)
    acc = _acc_dtype(g_ref.dtype)

    @pl.when(g == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_e, rows), 1)
    S = (row_ids == rel_ref[:]).astype(g_ref.dtype)
    # ge_t [mid, be]: contract the row dim of the g tile against S's row dim
    ge_ref[:] = jax.lax.dot_general(
        g_ref[:], S, dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=acc, precision=prec,
    ).astype(ge_ref.dtype)

    # recompute transposed radial MLP (activation math in f32 — see the
    # row-major kernel for the bf16 Mosaic lowering constraint)
    w1a = w1t_ref[:] * alpha0  # [H, n_emb]
    w2a = w2t_ref[:] * alpha1  # [WN, H]
    emb_t = emb_ref[:].T       # [n_emb, be]
    h_pre = jnp.dot(w1a, emb_t, preferred_element_type=acc, precision=prec)
    h_pre = h_pre.astype(acc)
    sig = jax.nn.sigmoid(h_pre)
    h_t = (h_pre * sig).astype(emb_t.dtype)  # [H, be]
    w_t = jnp.dot(w2a, h_t, preferred_element_type=acc, precision=prec).astype(
        emb_t.dtype
    )  # [WN, be]

    _compute_tp_bwd_block_T(
        plan, x_ref[:].T, y_ref[:].T, w_t, ge_ref[:], dxt_scr, dyt_scr, dw_scr
    )
    dx_ref[:] = dxt_scr[:].T
    dy_ref[:] = dyt_scr[:].T
    # kill cotangents of masked/padding slots ([1, be] sublane broadcast)
    dw_t = dw_scr[:] * mask_ref[:].T

    # MLP VJP, all contractions over the edge (lane) dimension
    dh_t = jax.lax.dot_general(
        w2a, dw_t, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc, precision=prec,
    ).astype(acc)  # [H, be]
    dh_pre_t = (dh_t * (sig * (1.0 + h_pre * (1.0 - sig)))).astype(emb_t.dtype)
    demb_t = jax.lax.dot_general(
        w1a, dh_pre_t, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc, precision=prec,
    )  # [n_emb, be]
    demb_ref[:] = demb_t.astype(demb_ref.dtype).T
    dw2_ref[:] += alpha1 * jax.lax.dot_general(
        h_t, dw_t, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc, precision=prec,
    ).astype(dw2_ref.dtype)
    dw1_ref[:] += alpha0 * jax.lax.dot_general(
        emb_t, dh_pre_t, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc, precision=prec,
    ).astype(dw1_ref.dtype)


def _take_ib(a, idx, axis=None):
    """``jnp.take`` with mode="clip".

    Every index in this module is pre-clamped (``min(take_idx, E-1)``) or a
    real node/edge id, so the default mode="fill" is pure waste: XLA
    materializes a select + NaN-broadcast pair around every gather, and it
    CANNOT fuse them into the Pallas custom-call operands — measured ~GiB/
    step of avoidable HBM traffic at 23k atoms (tools/hlo_bytes.py, r3).
    """
    return jnp.take(a, idx, axis=axis, mode="clip")


def _layout_and_gather(tp_plan, x, edge_attr, edge_dst, edge_src, edge_mask,
                       num_nodes, rows, block_e, layout=None, xtag="xfwd"):
    take_idx, rel_dst, chunk_tile, chunk_first, valid = _resolve_layout(
        edge_dst, edge_src, edge_mask, num_nodes, rows, block_e, layout
    )
    if take_idx is None:
        # identity (pre-relaid) stream — see relayout_edge_stream
        return (None, None, edge_src, _ablated_take(xtag, x, edge_src),
                edge_attr, valid, rel_dst, chunk_tile, chunk_first)
    E = edge_dst.shape[0]
    E_pal = take_idx.shape[0]
    safe_idx = jnp.minimum(take_idx, E - 1)
    src_lay = _take_ib(edge_src, safe_idx)
    x_lay = _take_ib(x, src_lay, axis=0)
    y_lay = _take_ib(edge_attr, safe_idx, axis=0)
    wmask = valid
    if edge_mask is not None:
        wmask = wmask & _take_ib(edge_mask, safe_idx)
    return take_idx, safe_idx, src_lay, x_lay, y_lay, wmask, rel_dst, chunk_tile, chunk_first


_BWD_BLOCK_E_CAP = int(
    _os.environ.get("NEQUIP_PALLAS_BWD_BLOCK_E", 256 if _TRANSPOSED else 128)
)


def bwd_block_e(block_e: int = None) -> int:
    """Edge-chunk width used by the MLP-fused backward kernel.

    In the row layout the backward's lane-padded vector temporaries VMEM-OOM
    Mosaic above 128; the transposed layout packs them 4x tighter and
    compiles (and is ~20% faster e2e) at 256.  Sweep with
    NEQUIP_PALLAS_BWD_BLOCK_E."""
    block_e = DEFAULT_BLOCK_E if block_e is None else block_e
    return min(block_e, _BWD_BLOCK_E_CAP)


def fused_tp_scatter_mlp(
    tp: TensorProduct,
    mlp,  # ops.mlp.ScalarMLP spec with dims [n_emb, H, WN], silu, no bias
    x,
    edge_attr,
    edge_embed,
    mlp_params: dict,
    edge_dst,
    edge_src,
    edge_mask,
    num_nodes: int,
    rows: int = DEFAULT_ROWS,
    block_e: int = DEFAULT_BLOCK_E,
    layouts=None,
):
    """Fully-fused conv: gather -> radial MLP -> CG TP -> scatter.

    The radial weights exist only chunk-at-a-time in VMEM.  Supports the
    standard depth-1 silu radial MLP (``interaction_block.py:119-127``).
    ``layouts`` is an optional (forward, backward) pair of precomputed edge
    layouts (``compute_edge_layout`` at (rows, block_e) and
    (rows, bwd_block_e(block_e))).
    """
    key = ("mlp", id(tp), id(mlp), num_nodes, rows, block_e, edge_mask is not None)
    if key not in _TP_CACHE:
        _TP_CACHE[key] = _make_fused_mlp(tp, mlp, num_nodes, rows, block_e, edge_mask is not None)
    if edge_mask is None:
        edge_mask = jnp.ones_like(edge_dst, dtype=bool)
    if layouts is None:
        layouts = (None, None)
    lay_f, lay_b = layouts
    if lay_f is None:
        lay_f = compute_edge_layout(
            edge_dst, edge_src, edge_mask, num_nodes, rows, block_e
        )
    if lay_b is None:
        lay_b = compute_edge_layout(
            edge_dst, edge_src, edge_mask, num_nodes, rows, bwd_block_e(block_e),
            with_dx=True,
        )
    return _TP_CACHE[key](
        x, edge_attr, edge_embed, mlp_params["w0"], mlp_params["w1"],
        edge_dst, edge_src, edge_mask, lay_f, lay_b,
    )


def _make_fused_mlp(tp, mlp, num_nodes, rows, block_e, has_mask):
    plan = _TPPlan(tp)
    assert mlp.num_layers == 2 and not mlp.bias and mlp.nonlinearity == "silu", (
        "fused radial MLP supports the standard depth-1 bias-free silu MLP"
    )
    n_emb, H, WN = mlp.dims
    assert WN == plan.weight_numel
    alpha0, alpha1 = float(mlp.alphas[0]), float(mlp.alphas[1])

    def forward(x, edge_attr, edge_embed, w1, w2, edge_dst, edge_src, edge_mask, lay_f):
        (take_idx, safe_idx, src_lay, x_lay, y_lay, wmask, rel_dst,
         chunk_tile, chunk_first) = _layout_and_gather(
            plan, x, edge_attr, edge_dst, edge_src,
            edge_mask if has_mask else None, num_nodes, rows, block_e,
            layout=lay_f)
        if take_idx is None:
            # identity stream: embeddings are exactly zero at masked slots by
            # the padding contract, and rel_dst == -1 kills their scatter row
            emb_lay = edge_embed
        else:
            emb_lay = _take_ib(edge_embed, safe_idx, axis=0)
            # zero embeddings of masked/padding slots: bias-free silu MLP then
            # produces exactly-zero weights, killing every path's message
            emb_lay = jnp.where(wmask[:, None], emb_lay, 0)
        E_pal = emb_lay.shape[0]
        G = E_pal // block_e
        rel_2d = rel_dst.reshape(E_pal, 1)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((block_e, plan.dim_in), lambda g, ct, cf: (g, 0)),
                pl.BlockSpec((block_e, plan.sh_dim), lambda g, ct, cf: (g, 0)),
                pl.BlockSpec((block_e, n_emb), lambda g, ct, cf: (g, 0)),
                pl.BlockSpec((block_e, 1), lambda g, ct, cf: (g, 0)),
                pl.BlockSpec(
                    (H, n_emb) if _TRANSPOSED else (n_emb, H),
                    lambda g, ct, cf: (0, 0),
                ),
                pl.BlockSpec(
                    (WN, H) if _TRANSPOSED else (H, WN),
                    lambda g, ct, cf: (0, 0),
                ),
            ],
            out_specs=pl.BlockSpec((rows, plan.mid_dim), lambda g, ct, cf: (ct[g], 0)),
            scratch_shapes=[
                pltpu.VMEM(
                    (plan.mid_dim, block_e) if _TRANSPOSED else (block_e, plan.mid_dim),
                    x.dtype,
                ),
                pltpu.VMEM(
                    (WN, block_e) if _TRANSPOSED else (block_e, WN), x.dtype
                ),
            ],
        )
        return pl.pallas_call(
            partial(
                _fwd_mlp_kernel_T if _TRANSPOSED else _fwd_mlp_kernel,
                plan, rows, block_e, alpha0, alpha1,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((num_nodes, plan.mid_dim), x.dtype),
            interpret=(jax.default_backend() == "cpu"),
        )(
            chunk_tile, chunk_first, x_lay, y_lay, emb_lay, rel_2d,
            w1.T if _TRANSPOSED else w1, w2.T if _TRANSPOSED else w2,
        )

    @jax.custom_vjp
    def fused(x, edge_attr, edge_embed, w1, w2, edge_dst, edge_src, edge_mask, lay_f, lay_b):
        return forward(x, edge_attr, edge_embed, w1, w2, edge_dst, edge_src, edge_mask, lay_f)

    def fwd(x, edge_attr, edge_embed, w1, w2, edge_dst, edge_src, edge_mask, lay_f, lay_b):
        out = fused(x, edge_attr, edge_embed, w1, w2, edge_dst, edge_src, edge_mask, lay_f, lay_b)
        return out, (x, edge_attr, edge_embed, w1, w2, edge_dst, edge_src, edge_mask, lay_b)

    @jax.custom_vjp
    def kernel_bwd(x, edge_attr, edge_embed, w1, w2, edge_dst, edge_src, edge_mask, lay_b, g):
        """Monolithic backward kernel: (dx, dy, demb, dw1, dw2) in one pass.

        Itself a ``custom_vjp`` (see ``kernel_bwd_bwd`` below) so the
        MLP-fused family is closed under AD like the trilinear family —
        force-loss *training* can run the fully-fused forward/backward."""
        be = bwd_block_e(block_e)  # bwd working set is ~2.5x fwd; smaller blocks
        (take_idx, safe_idx, src_lay, x_lay, y_lay, wmask, rel_dst,
         chunk_tile, chunk_first) = _layout_and_gather(
            plan, x, edge_attr, edge_dst, edge_src,
            edge_mask if has_mask else None, num_nodes, rows, be,
            layout=lay_b, xtag="xbwd")
        if take_idx is None:
            emb_lay = edge_embed
        else:
            emb_lay = _take_ib(edge_embed, safe_idx, axis=0)
            emb_lay = jnp.where(wmask[:, None], emb_lay, 0)
        E_pal = emb_lay.shape[0]
        G = E_pal // be
        rel_2d = rel_dst.reshape(E_pal, 1)
        mask_f = wmask.astype(x.dtype).reshape(E_pal, 1)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((be, plan.dim_in), lambda g_, ct, cf: (g_, 0)),
                pl.BlockSpec((be, plan.sh_dim), lambda g_, ct, cf: (g_, 0)),
                pl.BlockSpec((be, n_emb), lambda g_, ct, cf: (g_, 0)),
                pl.BlockSpec((be, 1), lambda g_, ct, cf: (g_, 0)),
                pl.BlockSpec((be, 1), lambda g_, ct, cf: (g_, 0)),
                pl.BlockSpec(
                    (H, n_emb) if _TRANSPOSED else (n_emb, H),
                    lambda g_, ct, cf: (0, 0),
                ),
                pl.BlockSpec(
                    (WN, H) if _TRANSPOSED else (H, WN),
                    lambda g_, ct, cf: (0, 0),
                ),
                pl.BlockSpec((rows, plan.mid_dim), lambda g_, ct, cf: (ct[g_], 0)),
            ],
            out_specs=[
                pl.BlockSpec((be, plan.dim_in), lambda g_, ct, cf: (g_, 0)),
                pl.BlockSpec((be, plan.sh_dim), lambda g_, ct, cf: (g_, 0)),
                pl.BlockSpec((be, n_emb), lambda g_, ct, cf: (g_, 0)),
                pl.BlockSpec((n_emb, H), lambda g_, ct, cf: (0, 0)),
                pl.BlockSpec((H, WN), lambda g_, ct, cf: (0, 0)),
            ],
            scratch_shapes=(
                [
                    pltpu.VMEM((plan.mid_dim, be), x.dtype),
                    pltpu.VMEM((plan.weight_numel, be), x.dtype),
                    pltpu.VMEM((plan.dim_in, be), x.dtype),
                    pltpu.VMEM((plan.sh_dim, be), x.dtype),
                ]
                if _TRANSPOSED
                else [
                    pltpu.VMEM((be, plan.mid_dim), x.dtype),
                    pltpu.VMEM((be, plan.weight_numel), x.dtype),
                ]
            ),
        )
        dx_lay, dy_lay, demb_lay, dw1, dw2 = pl.pallas_call(
            partial(
                _bwd_mlp_kernel_T if _TRANSPOSED else _bwd_mlp_kernel,
                plan, rows, be, alpha0, alpha1,
            ),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((E_pal, plan.dim_in), x.dtype),
                jax.ShapeDtypeStruct((E_pal, plan.sh_dim), x.dtype),
                jax.ShapeDtypeStruct((E_pal, n_emb), x.dtype),
                jax.ShapeDtypeStruct((n_emb, H), x.dtype),
                jax.ShapeDtypeStruct((H, WN), x.dtype),
            ],
            interpret=(jax.default_backend() == "cpu"),
        )(
            chunk_tile, chunk_first, x_lay, y_lay, emb_lay, rel_2d, mask_f,
            w1.T if _TRANSPOSED else w1, w2.T if _TRANSPOSED else w2, g,
        )

        dx = _dx_scatter(dx_lay, src_lay, wmask, num_nodes, rows, be, lay_b)
        if take_idx is None:
            # identity stream: cotangents already in slot order, exactly zero
            # at masked/padding slots (ge == 0 there)
            return dx, dy_lay, demb_lay, dw1.astype(w1.dtype), dw2.astype(w2.dtype)
        E = edge_dst.shape[0]
        dy = jnp.zeros_like(edge_attr).at[take_idx].set(
            jnp.where(wmask[:, None], dy_lay, 0), mode="drop"
        )
        demb = jnp.zeros_like(edge_embed).at[take_idx].set(
            jnp.where(wmask[:, None], demb_lay, 0), mode="drop"
        )
        return dx, dy, demb, dw1.astype(w1.dtype), dw2.astype(w2.dtype)

    def bwd(res, g):
        x, edge_attr, edge_embed, w1, w2, edge_dst, edge_src, edge_mask, lay_b = res
        dx, dy, demb, dw1, dw2 = kernel_bwd(
            x, edge_attr, edge_embed, w1, w2, edge_dst, edge_src, edge_mask, lay_b, g
        )
        return dx, dy, demb, dw1, dw2, None, None, None, None, None

    fused.defvjp(fwd, bwd)

    # ---- closure under AD: kernel_bwd's VJP via a differentiable
    # composition.  Write F(x, y, emb, w1, w2) = F_tri(x, y, M(emb, w1, w2))
    # with M the radial MLP and F_tri the trilinear gather-TP-scatter family
    # (AD-closed, ``_make_fused_uncached``).  kernel_bwd IS the VJP of F, so
    # its own VJP is obtained by differentiating the composition: XLA handles
    # M's (smooth) AD, the trilinear kernels handle F_tri's.  The [E, WN]
    # radial-weight tensor materializes in HBM only inside this second-order
    # pass (training) — forward/first-order stay fully fused.
    be = bwd_block_e(block_e)

    def _mlp_weights(emb, w1_, w2_):
        # exact ScalarMLP semantics for the depth-1 bias-free silu MLP
        # (ops/mlp.py __call__): alphas fold the init-variance gains
        h = jax.nn.silu(
            jnp.matmul(emb, w1_ * alpha0, preferred_element_type=emb.dtype)
        )
        return jnp.matmul(h, w2_ * alpha1, preferred_element_type=emb.dtype)

    def _bwd_ref(x, y, emb, w1, w2, edge_dst, edge_src, edge_mask, lay_b, g):
        # differentiable reference implementation of kernel_bwd, built
        # DIRECTLY on the trilinear backward B (itself AD-closed
        # analytically): kernel_bwd = [W = M(emb); (dx,dy,dW) = B(x,y,W,g);
        # (demb,dw1,dw2) = M_vjp(dW)].  The earlier jax.vjp(f)(g) form ran a
        # full trilinear FORWARD whose output was discarded — a duplicated
        # primal per layer per rr-train step (VERDICT r3 weak #6).
        # Masked-slot semantics match the monolithic kernel: B zeroes dW at
        # masked slots, so demb rows vanish there.
        W = _mlp_weights(emb, w1, w2)
        dx, dy, dW = fused_tp_scatter_bwd(
            tp, x, y, W, edge_dst, edge_src,
            edge_mask if has_mask else None,
            num_nodes, g, rows, be, layout=lay_b,
        )
        _, mlp_vjp = jax.vjp(_mlp_weights, emb, w1, w2)
        demb, dw1, dw2 = mlp_vjp(dW)
        return dx, dy, demb, dw1.astype(w1.dtype), dw2.astype(w2.dtype)

    def kernel_bwd_fwd(x, edge_attr, edge_embed, w1, w2, edge_dst, edge_src, edge_mask, lay_b, g):
        out = kernel_bwd(
            x, edge_attr, edge_embed, w1, w2, edge_dst, edge_src, edge_mask, lay_b, g
        )
        return out, (x, edge_attr, edge_embed, w1, w2, edge_dst, edge_src, edge_mask, lay_b, g)

    def kernel_bwd_bwd(res, cts):
        x, y, emb, w1, w2, edge_dst, edge_src, edge_mask, lay_b, g = res
        _, vjp2 = jax.vjp(
            lambda x_, y_, emb_, w1_, w2_, g_: _bwd_ref(
                x_, y_, emb_, w1_, w2_, edge_dst, edge_src, edge_mask, lay_b, g_
            ),
            x, y, emb, w1, w2, g,
        )
        ddx, ddy, ddemb, ddw1, ddw2, dg = vjp2(cts)
        return ddx, ddy, ddemb, ddw1, ddw2, None, None, None, None, dg

    kernel_bwd.defvjp(kernel_bwd_fwd, kernel_bwd_bwd)
    return fused


# TensorProduct instances are not hashable by content; key on identity
_TP_CACHE = {}


def fused_tp_scatter(
    tp: TensorProduct,
    x,
    edge_attr,
    edge_weight,
    edge_dst,
    edge_src,
    edge_mask,
    num_nodes: int,
    rows: int = DEFAULT_ROWS,
    block_e: int = DEFAULT_BLOCK_E,
    layout=None,
):
    key = (id(tp), num_nodes, rows, block_e, edge_mask is not None)
    if key not in _TP_CACHE:
        _TP_CACHE[key] = _make_fused_uncached(
            tp, num_nodes, rows, block_e, edge_mask is not None
        )
    fn, _ = _TP_CACHE[key]
    if edge_mask is None:
        edge_mask = jnp.ones_like(edge_dst, dtype=bool)
    if layout is None:
        # computed in-graph: XLA CSEs it across layers and fwd/bwd, but MD
        # drivers should precompute (compute_edge_layout) per NL rebuild
        layout = compute_edge_layout(
            edge_dst, edge_src, edge_mask, num_nodes, rows, block_e,
            with_dx=True,  # this layout also serves the kernel backward
        )
    return fn(x, edge_attr, edge_weight, edge_dst, edge_src, edge_mask, layout)


def fused_tp_scatter_bwd(
    tp: TensorProduct,
    x,
    edge_attr,
    edge_weight,
    edge_dst,
    edge_src,
    edge_mask,
    num_nodes: int,
    g,
    rows: int = DEFAULT_ROWS,
    block_e: int = DEFAULT_BLOCK_E,
    layout=None,
):
    """Direct entry to the trilinear family's backward B(x, y, w, g).

    ``B`` is itself a ``custom_vjp`` (AD-closed analytically — see
    ``_make_fused_uncached``), so callers that already HAVE the output
    cotangent can invoke the backward without running a forward pass whose
    output would be discarded.  This is what lets the MLP-fused family's
    composition VJP avoid the duplicated-primal tax in rr force-loss
    training (one full forward kernel per layer per step)."""
    key = (id(tp), num_nodes, rows, block_e, edge_mask is not None)
    if key not in _TP_CACHE:
        _TP_CACHE[key] = _make_fused_uncached(
            tp, num_nodes, rows, block_e, edge_mask is not None
        )
    _, bwd_fn = _TP_CACHE[key]
    if edge_mask is None:
        edge_mask = jnp.ones_like(edge_dst, dtype=bool)
    if layout is None:
        layout = compute_edge_layout(
            edge_dst, edge_src, edge_mask, num_nodes, rows, block_e,
            with_dx=True,
        )
    return bwd_fn(x, edge_attr, edge_weight, edge_dst, edge_src, edge_mask, layout, g)


def _make_fused_uncached(tp, num_nodes, rows, block_e, has_mask):
    """Build the fused op F and its kernel backward B, *closed under AD*.

    Write ``F(x, y, w) = scatter_dst(TP(x[src], y, w))`` — trilinear in
    (x, y, w) for a fixed graph — and ``B(x, y, w, g) = (dx, dy, dw)`` its
    VJP (the native backward kernel).  Because F is trilinear, every VJP of B
    is again expressible in F and B:

        <dx,cx> + <dy,cy> + <dw,cw>
            = <g, F(cx,y,w)> + <g, F(x,cy,w)> + <g, F(x,y,cw)>

    so  dg = F(cx,y,w) + F(x,cy,w) + F(x,y,cw)  (three forward kernels) and
    the input cotangents are components of B with one operand substituted by
    its co-output's cotangent (three backward kernels).  Registering this as
    B's custom_vjp closes the family under differentiation **to all orders**:
    force-loss training (reverse-over-reverse) runs entirely on the fused
    kernels — no XLA TP fallback (the reference gets the same property from
    torch.autograd.Function pairs in its OEQ/cuEq wrappers).
    """

    def _mask_or_none(edge_mask):
        return edge_mask if has_mask else None

    @jax.custom_vjp
    def fused(x, edge_attr, edge_weight, edge_dst, edge_src, edge_mask, layout):
        return _forward(
            tp, x, edge_attr, edge_weight, edge_dst, edge_src,
            _mask_or_none(edge_mask), num_nodes, rows, block_e, layout,
        )

    @jax.custom_vjp
    def fused_bwd(x, edge_attr, edge_weight, edge_dst, edge_src, edge_mask, layout, g):
        plan = _TPPlan(tp)
        return _backward_kernel_call(
            tp, plan, x, edge_attr, edge_weight, edge_dst, edge_src,
            _mask_or_none(edge_mask), num_nodes, rows, block_e, g, layout,
        )

    # ---- F's VJP: the native backward kernel --------------------------
    def fwd(x, edge_attr, edge_weight, edge_dst, edge_src, edge_mask, layout):
        out = fused(x, edge_attr, edge_weight, edge_dst, edge_src, edge_mask, layout)
        return out, (x, edge_attr, edge_weight, edge_dst, edge_src, edge_mask, layout)

    def bwd(res, g):
        x, edge_attr, edge_weight, edge_dst, edge_src, edge_mask, layout = res
        dx, dy, dw = fused_bwd(
            x, edge_attr, edge_weight, edge_dst, edge_src, edge_mask, layout, g
        )
        return dx, dy, dw, None, None, None, None

    fused.defvjp(fwd, bwd)

    # ---- B's VJP: three F calls + three B calls (closure under AD) ----
    def bwd_fwd(x, edge_attr, edge_weight, edge_dst, edge_src, edge_mask, layout, g):
        out = fused_bwd(x, edge_attr, edge_weight, edge_dst, edge_src, edge_mask, layout, g)
        return out, (x, edge_attr, edge_weight, edge_dst, edge_src, edge_mask, layout, g)

    def bwd_bwd(res, cts):
        x, y, w, edge_dst, edge_src, edge_mask, layout, g = res
        cx, cy, cw = cts  # cotangents of (dx, dy, dw)
        graph = (edge_dst, edge_src, edge_mask, layout)
        dg = (
            fused(cx, y, w, *graph)
            + fused(x, cy, w, *graph)
            + fused(x, y, cw, *graph)
        )
        b1 = fused_bwd(cx, y, w, *graph, g)  # terms with x -> cx
        b2 = fused_bwd(x, cy, w, *graph, g)  # terms with y -> cy
        b3 = fused_bwd(x, y, cw, *graph, g)  # terms with w -> cw
        dx = b2[0] + b3[0]
        dy = b1[1] + b3[1]
        dw = b1[2] + b2[2]
        return dx, dy, dw, None, None, None, None, dg

    fused_bwd.defvjp(bwd_fwd, bwd_bwd)
    return fused, fused_bwd


# ---------------------------------------------------------------------------
# tangent-fused trilinear kernels: primal + all three jvp terms of the conv
# TP in ONE pass.  The fr dual sweep's four kernel calls per slice
#
#     msg = K(x,y,w);  tmsg = K(tx,y,w) + K(x,ty,w) + K(x,y,dw)
#
# stream (x,y,w) three times each and build the one-hot scatter four times;
# the fused form loads each of (x,tx,y,ty,w,dw) once, shares the CG operand
# products across terms (tangent caches), and scatters msg/tmsg with one S.
# The fused BACKWARD collapses the four trilinear VJPs into six shared
# accumulator families (P1..P3 keyed by sh component, Q1..Q3 keyed by
# feature component) and pre-sums the three x-cotangent terms IN KERNEL —
# one dx row-scatter instead of three.  Transposed (edge-on-lanes) layout
# only; the 4-call path remains as the row-layout / kill-switch fallback
# (NEQUIP_JVP_FUSED=0).
# ---------------------------------------------------------------------------
def _jvp_fused_enabled() -> bool:
    return _TRANSPOSED and _os.environ.get("NEQUIP_JVP_FUSED", "1") == "1"


def _compute_tp_jvp_block_T(plan, x_t, tx_t, y_t, ty_t, w_t, dw_t,
                            msg_ref_t, tmsg_ref_t):
    """Fused CG contraction + tangent, transposed operands [dim, BLOCK_E].

    Per term the tangent of ``c*y*(x .* w)`` is ``c*ty*(x .* w) +
    c*y*(tx .* w + x .* dw)``; caching ``xw`` and its tangent ``txw`` per
    feature component makes the fused form ~5 multiplies per CG term versus
    the 4-call sweep's ~8 (plus one operand load instead of three).
    """
    msg_ref_t[:] = jnp.zeros_like(msg_ref_t)
    tmsg_ref_t[:] = jnp.zeros_like(tmsg_ref_t)
    for p in plan.paths:
        mul = p["mul"]
        wp = w_t[p["w_sl"], :]
        dwp = dw_t[p["w_sl"], :]
        xw_cache, txw_cache = {}, {}
        by_m3 = {}
        for m1, m2, m3, c in p["terms"]:
            by_m3.setdefault(m3, []).append((m1, m2, c))
        for m3, terms in by_m3.items():
            acc = tacc = None
            for m1, m2, c in terms:
                if m1 not in xw_cache:
                    off = p["x_off"] + m1 * mul
                    xr = x_t[off : off + mul, :]
                    xw_cache[m1] = xr * wp
                    txw_cache[m1] = tx_t[off : off + mul, :] * wp + xr * dwp
                yo = p["y_off"] + m2
                cy = c * y_t[yo : yo + 1, :]
                t = cy * xw_cache[m1]
                dt = cy * txw_cache[m1] + (c * ty_t[yo : yo + 1, :]) * xw_cache[m1]
                acc = t if acc is None else acc + t
                tacc = dt if tacc is None else tacc + dt
            row = p["out_off"] + m3 * mul
            msg_ref_t[row : row + mul, :] += acc.astype(msg_ref_t.dtype)
            tmsg_ref_t[row : row + mul, :] += tacc.astype(tmsg_ref_t.dtype)


def _jvp_kernel_T(plan, rows, block_e, with_acc, ct_ref, cf_ref,
                  x_ref, tx_ref, y_ref, ty_ref, w_ref, dw_ref, rel_ref, *rest):
    if with_acc:
        (acc_ref, tacc_ref, out_ref, tout_ref, msg_scr, tmsg_scr) = rest
    else:
        (out_ref, tout_ref, msg_scr, tmsg_scr) = rest
    g = pl.program_id(0)

    @pl.when(cf_ref[g] == 1)
    def _():
        if with_acc:
            out_ref[:] = acc_ref[:]
            tout_ref[:] = tacc_ref[:]
        else:
            out_ref[:] = jnp.zeros_like(out_ref)
            tout_ref[:] = jnp.zeros_like(tout_ref)

    _compute_tp_jvp_block_T(
        plan, x_ref[:].T, tx_ref[:].T, y_ref[:].T, ty_ref[:].T,
        w_ref[:].T, dw_ref[:].T, msg_scr, tmsg_scr,
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_e, rows), 1)
    S = (row_ids == rel_ref[:]).astype(out_ref.dtype)
    for scr, ref in ((msg_scr, out_ref), (tmsg_scr, tout_ref)):
        ref[:] += jax.lax.dot_general(
            S, scr[:], dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=_acc_dtype(scr.dtype),
            precision=_mxu_precision(scr.dtype),
        ).astype(ref.dtype)


def _jvp_forward(tp, x, tx, sh, tsh, w, dw, edge_src, num_nodes, layout,
                 rows=None, block_e=None, acc=None):
    """(msg, tmsg) of the conv TP in one fused pass over an IDENTITY
    (pre-relaid) edge stream.  ``acc`` = (msg_acc, tmsg_acc) folds a slice
    into running [N, mid] accumulators (edge-chunked fr sweep)."""
    rows = DEFAULT_ROWS if rows is None else rows
    block_e = DEFAULT_BLOCK_E if block_e is None else block_e
    plan = _TPPlan(tp)
    assert layout["take_idx"] is None, "_jvp_forward requires identity layout"
    rel_dst = layout["rel_dst"]
    chunk_tile, chunk_first = layout["chunk_tile"], layout["chunk_first"]
    E_pal = edge_src.shape[0]
    G = E_pal // block_e
    x_lay = _ablated_take("xfwd", x, edge_src)
    tx_lay = _take_ib(tx, edge_src, axis=0)
    rel_2d = rel_dst.reshape(E_pal, 1)

    def stream(d):
        return pl.BlockSpec((block_e, d), lambda g, ct, cf: (g, 0))

    node = pl.BlockSpec((rows, plan.mid_dim), lambda g, ct, cf: (ct[g], 0))
    in_specs = [
        stream(plan.dim_in), stream(plan.dim_in),
        stream(plan.sh_dim), stream(plan.sh_dim),
        stream(plan.weight_numel), stream(plan.weight_numel),
        stream(1),
    ]
    operands = [x_lay, tx_lay, sh, tsh, w, dw, rel_2d]
    interpret = jax.default_backend() == "cpu"
    io_aliases = {}
    if acc is not None:
        in_specs += [node, node]
        operands += [acc[0], acc[1]]
        if not interpret:
            io_aliases = {9: 0, 10: 1}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=in_specs,
        out_specs=[node, node],
        scratch_shapes=[
            pltpu.VMEM((plan.mid_dim, block_e), x.dtype),
            pltpu.VMEM((plan.mid_dim, block_e), x.dtype),
        ],
    )
    out, tout = pl.pallas_call(
        partial(_jvp_kernel_T, plan, rows, block_e, acc is not None),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_nodes, plan.mid_dim), x.dtype),
            jax.ShapeDtypeStruct((num_nodes, plan.mid_dim), x.dtype),
        ],
        interpret=interpret,
        input_output_aliases=io_aliases,
    )(chunk_tile, chunk_first, *operands)
    if acc is not None and not io_aliases:
        # interpret mode (no aliasing): restore output blocks of tiles this
        # slice never visits from the accumulators (see _forward)
        r = jnp.arange(num_nodes, dtype=jnp.int32)
        touched = (r >= chunk_tile[0] * rows) & (r < (chunk_tile[-1] + 1) * rows)
        out = jnp.where(touched[:, None], out, acc[0])
        tout = jnp.where(touched[:, None], tout, acc[1])
    return out, tout


def _compute_tp_jvp_bwd_block_T(plan, x_t, tx_t, y_t, ty_t, w_t, dw_t,
                                ge_t, get_t, dx_r, dtx_r, dy_r, dty_r,
                                dw_r, ddw_r):
    """Fused VJP of the four-term dual sweep, transposed operands.

    With ``B(a, b, v; G)`` the trilinear VJP, the sweep's reverse is

        dx  = B_x(x,y,w;g) + B_x(x,ty,w;gt) + B_x(x,y,dw;gt)
        dtx = B_x(tx,y,w;gt)                       (terms keyed by which
        dy  = B_y(..;g) + two gt terms, etc.        operand carried tangent)

    All twelve pieces factor through six accumulator families:
    P1=Σc·x·g, P2=Σc·x·gt, P3=Σc·tx·gt (keyed by sh component m2) and
    Q1=Σc·y·g, Q2=Σc·y·gt, Q3=Σc·ty·gt (keyed by feature component m1):

        dx  = w·(Q1+Q3) + dw·Q2        dtx  = w·Q2
        dy  = Σ w·(P1+P3) + dw·P2      dty  = Σ w·P2
        cw  = Σ y·(P1+P3) + ty·P2      cdw  = Σ y·P2

    (cw/cdw are the cotangents of the radial weights and their tangent,
    reversed through the MLP jvp by the caller.)  P2/Q2 are each consumed
    three/two times — the sharing the 4-call form cannot express.
    """
    dx_r[:] = jnp.zeros_like(dx_r)
    dtx_r[:] = jnp.zeros_like(dtx_r)
    dy_r[:] = jnp.zeros_like(dy_r)
    dty_r[:] = jnp.zeros_like(dty_r)
    cw_rows, cdw_rows = {}, {}
    for p in plan.paths:
        mul = p["mul"]
        wp = w_t[p["w_sl"], :]
        dwp = dw_t[p["w_sl"], :]
        by_m3 = {}
        for m1, m2, m3, c in p["terms"]:
            by_m3.setdefault(m3, []).append((m1, m2, c))
        P1, P2, P3 = {}, {}, {}
        Q1, Q2, Q3 = {}, {}, {}
        for m3, terms in by_m3.items():
            row = p["out_off"] + m3 * mul
            grow = ge_t[row : row + mul, :]
            gtrow = get_t[row : row + mul, :]
            for m1, m2, c in terms:
                xo = p["x_off"] + m1 * mul
                xr = x_t[xo : xo + mul, :]
                txr = tx_t[xo : xo + mul, :]
                t = c * (xr * grow)
                P1[m2] = t if m2 not in P1 else P1[m2] + t
                t = c * (xr * gtrow)
                P2[m2] = t if m2 not in P2 else P2[m2] + t
                t = c * (txr * gtrow)
                P3[m2] = t if m2 not in P3 else P3[m2] + t
                yo = p["y_off"] + m2
                cy = c * y_t[yo : yo + 1, :]
                cty = c * ty_t[yo : yo + 1, :]
                t = cy * grow
                Q1[m1] = t if m1 not in Q1 else Q1[m1] + t
                t = cy * gtrow
                Q2[m1] = t if m1 not in Q2 else Q2[m1] + t
                t = cty * gtrow
                Q3[m1] = t if m1 not in Q3 else Q3[m1] + t
        cw_acc = cdw_acc = None
        for m2 in P1:
            p13 = P1[m2] + P3[m2]
            p2 = P2[m2]
            yo = p["y_off"] + m2
            yv = y_t[yo : yo + 1, :]
            tyv = ty_t[yo : yo + 1, :]
            dy_r[yo : yo + 1, :] += jnp.sum(
                wp * p13 + dwp * p2, axis=0, keepdims=True
            )
            dty_r[yo : yo + 1, :] += jnp.sum(wp * p2, axis=0, keepdims=True)
            t = yv * p13 + tyv * p2
            cw_acc = t if cw_acc is None else cw_acc + t
            t = yv * p2
            cdw_acc = t if cdw_acc is None else cdw_acc + t
        for m1 in Q1:
            xo = p["x_off"] + m1 * mul
            dx_r[xo : xo + mul, :] += wp * (Q1[m1] + Q3[m1]) + dwp * Q2[m1]
            dtx_r[xo : xo + mul, :] += wp * Q2[m1]
        cw_rows[p["w_sl"].start] = (p["w_sl"], cw_acc)
        cdw_rows[p["w_sl"].start] = (p["w_sl"], cdw_acc)
    for rows_map, ref in ((cw_rows, dw_r), (cdw_rows, ddw_r)):
        pos_ = 0
        for start in sorted(rows_map):
            sl, acc_v = rows_map[start]
            if sl.start > pos_:
                ref[pos_ : sl.start, :] = jnp.zeros(
                    (sl.start - pos_, x_t.shape[1]), dtype=ref.dtype
                )
            ref[sl, :] = acc_v.astype(ref.dtype)
            pos_ = sl.stop
        if pos_ < plan.weight_numel:
            ref[pos_ :, :] = jnp.zeros(
                (plan.weight_numel - pos_, x_t.shape[1]), dtype=ref.dtype
            )


def _jvp_bwd_kernel_T(plan, rows, block_e, ct_ref, cf_ref,
                      x_ref, tx_ref, y_ref, ty_ref, w_ref, dw_ref, rel_ref,
                      g_ref, gt_ref,
                      dx_ref, dtx_ref, dy_ref, dty_ref, dwo_ref, ddwo_ref,
                      ge_scr, get_scr, dx_scr, dtx_scr, dy_scr, dty_scr,
                      dw_scr, ddw_scr):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_e, rows), 1)
    S = (row_ids == rel_ref[:]).astype(g_ref.dtype)
    for gr, scr in ((g_ref, ge_scr), (gt_ref, get_scr)):
        scr[:] = jax.lax.dot_general(
            gr[:], S, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=_acc_dtype(gr.dtype),
            precision=_mxu_precision(gr.dtype),
        ).astype(scr.dtype)
    _compute_tp_jvp_bwd_block_T(
        plan, x_ref[:].T, tx_ref[:].T, y_ref[:].T, ty_ref[:].T,
        w_ref[:].T, dw_ref[:].T, ge_scr[:], get_scr[:],
        dx_scr, dtx_scr, dy_scr, dty_scr, dw_scr, ddw_scr,
    )
    dx_ref[:] = dx_scr[:].T
    dtx_ref[:] = dtx_scr[:].T
    dy_ref[:] = dy_scr[:].T
    dty_ref[:] = dty_scr[:].T
    dwo_ref[:] = dw_scr[:].T
    ddwo_ref[:] = ddw_scr[:].T


def _jvp_backward_kernel_call(tp, plan, x, tx, sh, tsh, w, dw, edge_src,
                              num_nodes, rows, block_e, g, gt, layout):
    """Reverse of the fused dual-sweep slice: one kernel pass produces the
    six per-edge/param cotangent streams; the three x-cotangent terms are
    pre-summed in kernel so ONE dx row-scatter (plus one for dtx) replaces
    the 4-call form's four."""
    assert layout["take_idx"] is None
    rel_dst = layout["rel_dst"]
    chunk_tile, chunk_first = layout["chunk_tile"], layout["chunk_first"]
    E_pal = edge_src.shape[0]
    G = E_pal // block_e
    x_lay = _ablated_take("xbwd", x, edge_src)
    tx_lay = _take_ib(tx, edge_src, axis=0)
    rel_2d = rel_dst.reshape(E_pal, 1)

    def stream(d):
        return pl.BlockSpec((block_e, d), lambda g_, ct, cf: (g_, 0))

    node = pl.BlockSpec((rows, plan.mid_dim), lambda g_, ct, cf: (ct[g_], 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            stream(plan.dim_in), stream(plan.dim_in),
            stream(plan.sh_dim), stream(plan.sh_dim),
            stream(plan.weight_numel), stream(plan.weight_numel),
            stream(1), node, node,
        ],
        out_specs=[
            stream(plan.dim_in), stream(plan.dim_in),
            stream(plan.sh_dim), stream(plan.sh_dim),
            stream(plan.weight_numel), stream(plan.weight_numel),
        ],
        scratch_shapes=[
            pltpu.VMEM((plan.mid_dim, block_e), x.dtype),
            pltpu.VMEM((plan.mid_dim, block_e), x.dtype),
            pltpu.VMEM((plan.dim_in, block_e), x.dtype),
            pltpu.VMEM((plan.dim_in, block_e), x.dtype),
            pltpu.VMEM((plan.sh_dim, block_e), x.dtype),
            pltpu.VMEM((plan.sh_dim, block_e), x.dtype),
            pltpu.VMEM((plan.weight_numel, block_e), x.dtype),
            pltpu.VMEM((plan.weight_numel, block_e), x.dtype),
        ],
    )
    dx_lay, dtx_lay, dy_lay, dty_lay, cw_lay, cdw_lay = pl.pallas_call(
        partial(_jvp_bwd_kernel_T, plan, rows, block_e),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((E_pal, plan.dim_in), x.dtype),
            jax.ShapeDtypeStruct((E_pal, plan.dim_in), x.dtype),
            jax.ShapeDtypeStruct((E_pal, plan.sh_dim), x.dtype),
            jax.ShapeDtypeStruct((E_pal, plan.sh_dim), x.dtype),
            jax.ShapeDtypeStruct((E_pal, plan.weight_numel), x.dtype),
            jax.ShapeDtypeStruct((E_pal, plan.weight_numel), x.dtype),
        ],
        interpret=(jax.default_backend() == "cpu"),
    )(chunk_tile, chunk_first, x_lay, tx_lay, sh, tsh, w, dw, rel_2d, g, gt)

    wmask = layout["valid"]
    dx = _dx_scatter(dx_lay, edge_src, wmask, num_nodes, rows, block_e, layout)
    dtx = _dx_scatter(dtx_lay, edge_src, wmask, num_nodes, rows, block_e, layout)
    return dx, dtx, dy_lay, dty_lay, cw_lay, cdw_lay


# ---------------------------------------------------------------------------
# edge-chunked fr dual sweep: (msg, tmsg) of one interaction layer's conv,
# scanned over slices of the relaid edge stream.
# ---------------------------------------------------------------------------
def chunked_jvp_conv(
    tp: TensorProduct,
    mlp_module,
    mlp_params: dict,
    x,
    tx,
    sh,
    tsh,
    emb,
    temb,
    edge_src,
    layout: dict,
    num_nodes: int,
    n_chunks: int,
    rows: int = DEFAULT_ROWS,
    block_e: int = DEFAULT_BLOCK_E,
):
    """``(msg, tmsg)`` of the conv TP-scatter and its input tangent, computed
    as a ``lax.scan`` over ``n_chunks`` contiguous slices of the relaid edge
    stream — the memory-floor cutter for fr-mode force training.

    The fr dual sweep's per-layer backward window holds several
    ``[E, weight_numel]`` / ``[E, dim_in]`` transients at once (radial
    weights + their tangent, the gathered ``x``/``tx`` rows, and the four
    kernel backwards' per-slot cotangents): ~6 GiB at 23k atoms f32, scaling
    to ~28 GiB at 108k — past single-chip HBM (VERDICT r3 weak #4).  Slicing
    the edge stream makes every such transient slice-sized (1/C), while node
    arrays (the two ``[N, mid]`` accumulators, ``dx``/``dtx``) stay whole.

    Mechanics: requires the IDENTITY layout of ``relayout_edge_stream``
    (``take_idx is None``), whose per-tile slot runs mean a contiguous slice
    of chunks covers a contiguous tile range with no tile skipped.  Each
    slice folds into running ``[N, mid]`` accumulators via the
    ``_kernel_from_acc`` variant (a tile's first chunk in the slice
    initializes its output block from the accumulator, so a boundary tile
    split across slices just re-enters through it).  All four jvp terms

        msg  = K(x, sh, w),
        tmsg = K(tx, sh, w) + K(x, tsh, w) + K(x, sh, dw),
        (w, dw) = jvp(MLP)(emb; temb)

    route through the trilinear kernel family; the radial MLP runs on the
    slice in plain XLA, so ``w``/``dw`` exist only slice-at-a-time.  The VJP
    is hand-written (its own reverse ``lax.scan``) because the backward is
    exactly where the window lives: per slice it recomputes ``(w, dw)``,
    runs the four trilinear backward kernels, and reverses the MLP jvp —
    node cotangents accumulate in scan carries, per-edge cotangents
    (``dsh``/``dtsh``/``demb``/``dtemb``) stack back to full streams.  The
    slice ``dx`` row-scatter uses XLA ``segment_sum`` (the ``"segsum"``
    sentinel in ``_dx_scatter``): per-slice src layouts would need an
    in-graph argsort per step.

    Reference analog: none — the reference's answer to force-training memory
    is DDP over more GPUs (``/root/reference/docs/guide/accelerations/``);
    chunking the dual sweep is what lets a single chip train 100k-atom f32.
    """
    E_pal = sh.shape[0]
    G = E_pal // block_e
    C = int(n_chunks)
    assert G % C == 0 and E_pal % block_e == 0, (
        f"edge stream ({E_pal} slots, {G} chunks) must split into {C} equal "
        "slices of whole chunks"
    )
    assert layout.get("take_idx", 0) is None, (
        "chunked_jvp_conv requires the identity (pre-relaid) edge layout"
    )
    fused_jvp = _jvp_fused_enabled()
    key = ("chunked", id(tp), id(mlp_module), num_nodes, rows, block_e, C, fused_jvp)
    if key not in _TP_CACHE:
        _TP_CACHE[key] = _make_chunked_jvp(
            tp, mlp_module, num_nodes, rows, block_e, C, fused_jvp
        )
    Gc, Es = G // C, E_pal // C
    stk = {
        "src": edge_src.reshape(C, Es),
        "rel": layout["rel_dst"].reshape(C, Es),
        "ct": layout["chunk_tile"].reshape(C, Gc),
        # every slice's first chunk initializes its tile's output block from
        # the accumulator (a boundary tile's previous partial re-enters)
        "cf": layout["chunk_first"].reshape(C, Gc).at[:, 0].set(1),
        "valid": layout["valid"].reshape(C, Es),
    }
    return _TP_CACHE[key](x, tx, sh, tsh, emb, temb, mlp_params, stk)


def _make_chunked_jvp(tp, mlp_module, num_nodes, rows, block_e, C, fused_jvp=False):
    plan = _TPPlan(tp)

    def _mlp_jvp(p, emb_s, temb_s):
        w_s, dw_s = jax.jvp(lambda e: mlp_module(p, e), (emb_s,), (temb_s,))
        return w_s, dw_s

    def _slice_layout(xs):
        return {
            "take_idx": None,
            "rel_dst": xs["rel"],
            "chunk_tile": xs["ct"],
            "chunk_first": xs["cf"],
            "valid": xs["valid"],
            "dx": "segsum",
        }

    @jax.custom_vjp
    def chunked(x, tx, sh, tsh, emb, temb, mlp_params, stk):
        C_, Es = stk["src"].shape
        mid = plan.mid_dim

        def body(carry, xs):
            msg_acc, tmsg_acc = carry
            lay_s = _slice_layout(xs)
            src_s = xs["src"]
            w_s, dw_s = _mlp_jvp(mlp_params, xs["emb"], xs["temb"])
            w_s, dw_s = w_s.astype(x.dtype), dw_s.astype(x.dtype)
            if fused_jvp:
                msg_acc, tmsg_acc = _jvp_forward(
                    tp, x, tx, xs["sh"], xs["tsh"], w_s, dw_s, src_s,
                    num_nodes, lay_s, rows, block_e, acc=(msg_acc, tmsg_acc),
                )
                return (msg_acc, tmsg_acc), None
            kw = dict(num_nodes=num_nodes, rows=rows, block_e=block_e, layout=lay_s)
            msg_acc = _forward(tp, x, xs["sh"], w_s, src_s, src_s, None,
                               acc=msg_acc, **kw)
            tmsg_acc = _forward(tp, tx, xs["sh"], w_s, src_s, src_s, None,
                                acc=tmsg_acc, **kw)
            tmsg_acc = _forward(tp, x, xs["tsh"], w_s, src_s, src_s, None,
                                acc=tmsg_acc, **kw)
            tmsg_acc = _forward(tp, x, xs["sh"], dw_s, src_s, src_s, None,
                                acc=tmsg_acc, **kw)
            return (msg_acc, tmsg_acc), None

        init = (
            jnp.zeros((num_nodes, mid), x.dtype),
            jnp.zeros((num_nodes, mid), x.dtype),
        )
        xs = dict(stk, sh=sh.reshape(C_, Es, -1), tsh=tsh.reshape(C_, Es, -1),
                  emb=emb.reshape(C_, Es, -1), temb=temb.reshape(C_, Es, -1))
        (msg, tmsg), _ = jax.lax.scan(body, init, xs)
        return msg, tmsg

    def fwd(x, tx, sh, tsh, emb, temb, mlp_params, stk):
        out = chunked(x, tx, sh, tsh, emb, temb, mlp_params, stk)
        return out, (x, tx, sh, tsh, emb, temb, mlp_params, stk)

    def bwd(res, cts):
        x, tx, sh, tsh, emb, temb, mlp_params, stk = res
        g_msg, g_tmsg = cts
        C_, Es = stk["src"].shape

        def body(carry, xs):
            dx, dtx, dmlp = carry
            lay_s = _slice_layout(xs)
            src_s = xs["src"]
            w_s, dw_s = _mlp_jvp(mlp_params, xs["emb"], xs["temb"])
            w_s, dw_s = w_s.astype(x.dtype), dw_s.astype(x.dtype)
            if fused_jvp:
                dxs, dtxs, dsh_s, dtsh_s, cw_s, cdw_s = (
                    _jvp_backward_kernel_call(
                        tp, plan, x, tx, xs["sh"], xs["tsh"], w_s, dw_s,
                        src_s, num_nodes, rows, block_e, g_msg, g_tmsg,
                        layout=lay_s,
                    )
                )
                dx = dx + dxs
                dtx = dtx + dtxs
                cw_s = cw_s.astype(emb.dtype)
                cdw_s = cdw_s.astype(emb.dtype)
            else:
                B = lambda xx, yy, ww, gg: _backward_kernel_call(
                    tp, plan, xx, yy, ww, src_s, src_s, None,
                    num_nodes, rows, block_e, gg, layout=lay_s,
                )
                dx1, dy1, dw1 = B(x, xs["sh"], w_s, g_msg)
                dx2, dy2, dw2 = B(tx, xs["sh"], w_s, g_tmsg)
                dx3, dy3, dw3 = B(x, xs["tsh"], w_s, g_tmsg)
                dx4, dy4, dw4 = B(x, xs["sh"], dw_s, g_tmsg)
                dx = dx + dx1 + dx3 + dx4
                dtx = dtx + dx2
                dsh_s = dy1 + dy2 + dy4
                dtsh_s = dy3
                # reverse through (emb, temb, params) -> (w, dw): cw collects
                # the three w-operand kernels, cdw the dw-operand one
                cw_s = (dw1 + dw2 + dw3).astype(emb.dtype)
                cdw_s = dw4.astype(emb.dtype)
            _, pull = jax.vjp(
                lambda e, t, p: _mlp_jvp(p, e, t), xs["emb"], xs["temb"], mlp_params
            )
            demb_s, dtemb_s, dp = pull((cw_s, cdw_s))
            dmlp = jax.tree.map(jnp.add, dmlp, dp)
            return (dx, dtx, dmlp), (dsh_s, dtsh_s, demb_s, dtemb_s)

        init = (
            jnp.zeros_like(x),
            jnp.zeros_like(tx),
            jax.tree.map(jnp.zeros_like, mlp_params),
        )
        xs = dict(stk, sh=sh.reshape(C_, Es, -1), tsh=tsh.reshape(C_, Es, -1),
                  emb=emb.reshape(C_, Es, -1), temb=temb.reshape(C_, Es, -1))
        (dx, dtx, dmlp), ys = jax.lax.scan(body, init, xs)
        dsh, dtsh, demb, dtemb = (y.reshape(C_ * Es, -1) for y in ys)
        return (
            dx, dtx,
            dsh.astype(sh.dtype), dtsh.astype(tsh.dtype),
            demb.astype(emb.dtype), dtemb.astype(temb.dtype),
            dmlp, None,
        )

    chunked.defvjp(fwd, bwd)
    return chunked


def chunked_conv(
    tp: TensorProduct,
    mlp_module,
    mlp_params: dict,
    x,
    sh,
    emb,
    edge_src,
    layout: dict,
    num_nodes: int,
    n_chunks: int,
    rows: int = DEFAULT_ROWS,
    block_e: int = DEFAULT_BLOCK_E,
):
    """Primal conv TP-scatter scanned over edge-stream slices (see
    ``chunked_jvp_conv``).

    The fr train step's pass 1 computes E+F through the ordinary reverse
    force sweep — whose per-layer backward window holds the same
    ``[E, weight_numel]`` / ``[E, dim_in]`` transients as the dual sweep and
    saturates the chunked-jvp memory win (~3.8 GiB of the 23k f32 floor is
    pass 1).  This op chunks that window too: forward is a ``lax.scan``
    folding slices into one ``[N, mid]`` accumulator via ``_kernel_from_acc``;
    the hand-written VJP re-scans, running the trilinear backward kernel and
    the radial-MLP reverse per slice.
    """
    E_pal = sh.shape[0]
    G = E_pal // block_e
    C = int(n_chunks)
    assert G % C == 0 and E_pal % block_e == 0
    assert layout.get("take_idx", 0) is None
    key = ("chunkedp", id(tp), id(mlp_module), num_nodes, rows, block_e, C)
    if key not in _TP_CACHE:
        _TP_CACHE[key] = _make_chunked_primal(
            tp, mlp_module, num_nodes, rows, block_e, C
        )
    Gc, Es = G // C, E_pal // C
    stk = {
        "src": edge_src.reshape(C, Es),
        "rel": layout["rel_dst"].reshape(C, Es),
        "ct": layout["chunk_tile"].reshape(C, Gc),
        "cf": layout["chunk_first"].reshape(C, Gc).at[:, 0].set(1),
        "valid": layout["valid"].reshape(C, Es),
    }
    return _TP_CACHE[key](x, sh, emb, mlp_params, stk)


def _make_chunked_primal(tp, mlp_module, num_nodes, rows, block_e, C):
    plan = _TPPlan(tp)

    def _slice_layout(xs):
        return {
            "take_idx": None,
            "rel_dst": xs["rel"],
            "chunk_tile": xs["ct"],
            "chunk_first": xs["cf"],
            "valid": xs["valid"],
            "dx": "segsum",
        }

    @jax.custom_vjp
    def chunked(x, sh, emb, mlp_params, stk):
        C_, Es = stk["src"].shape

        def body(msg_acc, xs):
            w_s = mlp_module(mlp_params, xs["emb"]).astype(x.dtype)
            msg_acc = _forward(
                tp, x, xs["sh"], w_s, xs["src"], xs["src"], None,
                num_nodes=num_nodes, rows=rows, block_e=block_e,
                layout=_slice_layout(xs), acc=msg_acc,
            )
            return msg_acc, None

        xs = dict(stk, sh=sh.reshape(C_, Es, -1), emb=emb.reshape(C_, Es, -1))
        msg, _ = jax.lax.scan(
            body, jnp.zeros((num_nodes, plan.mid_dim), x.dtype), xs
        )
        return msg

    def fwd(x, sh, emb, mlp_params, stk):
        return chunked(x, sh, emb, mlp_params, stk), (x, sh, emb, mlp_params, stk)

    def bwd(res, g):
        x, sh, emb, mlp_params, stk = res
        C_, Es = stk["src"].shape

        def body(carry, xs):
            dx, dmlp = carry
            w_s = mlp_module(mlp_params, xs["emb"]).astype(x.dtype)
            dx_s, dsh_s, dw_s = _backward_kernel_call(
                tp, plan, x, xs["sh"], w_s, xs["src"], xs["src"], None,
                num_nodes, rows, block_e, g, layout=_slice_layout(xs),
            )
            _, pull = jax.vjp(
                lambda e, p: mlp_module(p, e), xs["emb"], mlp_params
            )
            demb_s, dp = pull(dw_s.astype(emb.dtype))
            return (dx + dx_s, jax.tree.map(jnp.add, dmlp, dp)), (dsh_s, demb_s)

        init = (jnp.zeros_like(x), jax.tree.map(jnp.zeros_like, mlp_params))
        xs = dict(stk, sh=sh.reshape(C_, Es, -1), emb=emb.reshape(C_, Es, -1))
        (dx, dmlp), (dsh, demb) = jax.lax.scan(body, init, xs)
        return (
            dx,
            dsh.reshape(C_ * Es, -1).astype(sh.dtype),
            demb.reshape(C_ * Es, -1).astype(emb.dtype),
            dmlp,
            None,
        )

    chunked.defvjp(fwd, bwd)
    return chunked
