"""The NequIP message-passing interaction block.

Parity: ``InteractionBlock``
(``/root/reference/nequip/nn/interaction_block.py:21-207``):

    linear_1 -> avg-num-neighbor norm -> [ghost exchange] ->
    TP-scatter with radial-MLP edge weights -> linear_2 -> + self-connection

The ``uvu`` instruction list is built by CG selection rules against the
requested output irreps, sorted so the second linear sees coalesced chunks.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

import jax

from ..data import _keys
from ..ops.irreps import Irreps
from ..ops.linear import Linear
from ..ops.mlp import ScalarMLP as ScalarMLPFunction
from ..ops.tensor_product import fully_connected_tensor_product, uvu_instructions
from .ghost_exchange import NoOpGhostExchange
from .module import GraphModule, Params
from .norm import AvgNumNeighborsNorm
from .tp_scatter import TensorProductScatter

# one-time trace-time warnings when NEQUIP_FR_EDGE_CHUNKS is set but the
# chunked path cannot activate (ADVICE r4: the bench OOM ladder would
# otherwise silently re-run the exact config that just OOM'd)
_CHUNK_FALLBACK_WARNED: set = set()


def _warn_chunk_fallback(site: str, n_chunks: int, detail: str) -> None:
    key = (site, n_chunks, detail)
    if key not in _CHUNK_FALLBACK_WARNED:
        _CHUNK_FALLBACK_WARNED.add(key)
        import logging

        logging.getLogger("nequip_tpu").warning(
            "NEQUIP_FR_EDGE_CHUNKS=%d requested but the %s chunked path "
            "cannot activate (%s); falling back to the unchunked sweep — "
            "the memory win does NOT apply",
            n_chunks,
            site,
            detail,
        )


class InteractionBlock(GraphModule):
    def __init__(
        self,
        irreps_in,
        irreps_out,
        radial_mlp_depth: int = 1,
        radial_mlp_width: int = 8,
        use_sc: bool = True,
        is_first_layer: bool = False,
        type_names: Optional[Sequence[str]] = None,
        avg_num_neighbors: Optional[Union[float, Dict[str, float]]] = None,
        tp_impl: str = "xla",
    ):
        super().__init__()
        self._init_irreps(
            irreps_in=irreps_in,
            required_irreps_in=[
                _keys.EDGE_EMBEDDING_KEY,
                _keys.EDGE_ATTRS_KEY,
                _keys.NODE_FEATURES_KEY,
                _keys.NODE_ATTRS_KEY,
            ],
            irreps_out={_keys.NODE_FEATURES_KEY: Irreps(irreps_out)},
        )
        # the edge embedding must be invariant scalars (feeds a dense MLP)
        edge_emb_irreps = self.irreps_in[_keys.EDGE_EMBEDDING_KEY]
        assert all(mi.ir.l == 0 and mi.ir.p == 1 for mi in edge_emb_irreps), (
            f"edge embedding must be 0e scalars, got {edge_emb_irreps}"
        )
        self.use_sc = use_sc
        self.is_first_layer = is_first_layer

        feature_irreps_in = self.irreps_in[_keys.NODE_FEATURES_KEY]
        feature_irreps_out = self.irreps_out[_keys.NODE_FEATURES_KEY]
        irreps_edge_attr = self.irreps_in[_keys.EDGE_ATTRS_KEY]

        self.avg_num_neighbors_norm = AvgNumNeighborsNorm(
            avg_num_neighbors=avg_num_neighbors,
            type_names=type_names,
            irreps_in=self.irreps_in,
        )

        self.linear_1 = Linear(feature_irreps_in, feature_irreps_in)

        irreps_mid, instructions = uvu_instructions(
            feature_irreps_in, irreps_edge_attr, feature_irreps_out
        )
        self.tp_scatter = TensorProductScatter(
            feature_irreps_in, irreps_edge_attr, irreps_mid, instructions, impl=tp_impl
        )

        self.edge_mlp = ScalarMLPFunction(
            input_dim=self.irreps_in[_keys.EDGE_EMBEDDING_KEY].num_irreps,
            output_dim=self.tp_scatter.weight_numel,
            hidden_layers_depth=radial_mlp_depth,
            hidden_layers_width=radial_mlp_width,
            nonlinearity="silu",
            bias=False,
            forward_weight_init=True,
        )

        # simplify: merged same-ir chunks (changes Linear normalization like
        # the reference notes at interaction_block.py:128-137)
        self.irreps_mid_simplified = irreps_mid.simplify()
        self._mid_needs_merge = len(self.irreps_mid_simplified) != len(irreps_mid)
        self.irreps_mid = irreps_mid
        if self._mid_needs_merge:
            mm = jax.custom_vjp(self._merge_mid_impl)
            mm.defvjp(
                lambda x: (self._merge_mid_impl(x), None),
                lambda _, ct: (self._unmerge_mid(ct),),
            )
            self._merge_cvjp = mm
        self.linear_2 = Linear(self.irreps_mid_simplified, feature_irreps_out)

        self.sc = (
            fully_connected_tensor_product(
                feature_irreps_in,
                self.irreps_in[_keys.NODE_ATTRS_KEY],
                feature_irreps_out,
            )
            if use_sc
            else None
        )

        self.ghost_exchange = NoOpGhostExchange(
            field=_keys.NODE_FEATURES_KEY, irreps_in=self.irreps_in
        )

    # ------------------------------------------------------------------
    def init(self, rng) -> Params:
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        params = {
            "linear_1": self.linear_1.init(k1),
            "edge_mlp": self.edge_mlp.init(k2),
            "linear_2": self.linear_2.init(k3),
        }
        if self.sc is not None:
            params["sc"] = self.sc.init_weights(k4)
        return params

    def _merge_mid_impl(self, x):
        import jax.numpy as jnp

        batch = x.shape[:-1]
        out = []
        slices = self.irreps_mid.slices()
        i = 0
        while i < len(self.irreps_mid):
            ir = self.irreps_mid[i].ir
            group = []
            while i < len(self.irreps_mid) and self.irreps_mid[i].ir == ir:
                mi = self.irreps_mid[i]
                group.append(
                    x[..., slices[i]].reshape(batch + (ir.dim, mi.mul))
                )
                i += 1
            merged = jnp.concatenate(group, axis=-1)  # (…, 2l+1, sum_mul)
            out.append(merged.reshape(batch + (-1,)))
        return jnp.concatenate(out, axis=-1)

    def _unmerge_mid(self, ct):
        """Exact inverse of ``_merge_mid_impl`` (it is a static column
        permutation): slice the merged cotangent per group, split the mul
        axis back into per-path blocks, and concatenate in the original
        uncoalesced order."""
        import jax.numpy as jnp

        batch = ct.shape[:-1]
        pieces = []
        goff = 0
        i = 0
        while i < len(self.irreps_mid):
            ir = self.irreps_mid[i].ir
            muls = []
            while i < len(self.irreps_mid) and self.irreps_mid[i].ir == ir:
                muls.append(self.irreps_mid[i].mul)
                i += 1
            summul = sum(muls)
            seg = ct[..., goff : goff + ir.dim * summul].reshape(
                batch + (ir.dim, summul)
            )
            moff = 0
            for m in muls:
                pieces.append(
                    seg[..., :, moff : moff + m].reshape(batch + (ir.dim * m,))
                )
                moff += m
            goff += ir.dim * summul
        return jnp.concatenate(pieces, axis=-1)

    def _merge_mid(self, x):
        """Reshape uncoalesced mid chunks (same ir, adjacent) into merged
        ir_mul chunks so linear_2 sees the simplified layout.

        Carries a custom VJP: the map is a static column permutation, but
        XLA's autodiff of the slice decomposition rebuilds the cotangent as
        a chain of full-width ``pad`` + ``add_any`` (~1 GiB/step of
        materialized HBM traffic at 23k atoms in the E+F backward, StableHLO
        census r3); the hand rule applies the inverse permutation with
        slice + concatenate instead.  Plain-jnp bwd, so rr (reverse-over-
        reverse) force training differentiates through it; the fr dual sweep
        never forward-diffs it (``InteractionBlock.jvp`` applies it to the
        tangent directly — jvp of a permutation is itself).
        """
        if not self._mid_needs_merge:
            return x
        from ..ops import linear as linear_mod

        if not linear_mod.CUSTOM_VJP:  # one switch for structural VJPs
            return self._merge_mid_impl(x)
        return self._merge_cvjp(x)

    def __call__(self, params: Params, data: dict) -> dict:
        x = data[_keys.NODE_FEATURES_KEY]
        num_nodes = x.shape[0]

        if self.sc is not None:
            sc = self.sc(x, data[_keys.NODE_ATTRS_KEY], params["sc"].astype(x.dtype))

        x = self.linear_1(params["linear_1"], x)

        data = dict(data)
        data[_keys.NODE_FEATURES_KEY] = x
        data = self.avg_num_neighbors_norm({}, data)
        if not self.is_first_layer:
            data = self.ghost_exchange({}, data)
        x = data[_keys.NODE_FEATURES_KEY]

        use_fully_fused = (
            self.tp_scatter.impl == "pallas_fused"
            and self.edge_mlp.num_layers == 2
            and not self.edge_mlp.bias
            and self.edge_mlp.nonlinearity == "silu"
            # the in-kernel radial MLP reads raw weights; reparametrized
            # weights (weight_norm/...) must go through the MLP itself
            and self.edge_mlp.parametrization is None
        )

        # NEQUIP_FR_EDGE_CHUNKS also chunks the PRIMAL conv: the fr train
        # step's pass 1 (E+F through the ordinary reverse force sweep) has
        # the same per-layer [E, *] backward window as the dual sweep and
        # would otherwise cap the memory win (tp_scatter.py chunked_conv).
        # Opt-in via env: inference paths don't set it and keep the
        # fully-fused single-pass kernels.
        import os as _os

        n_chunks = int(_os.environ.get("NEQUIP_FR_EDGE_CHUNKS", "0") or 0)
        if n_chunks > 1 and self.tp_scatter.impl in ("pallas", "pallas_fused"):
            from ..ops.pallas.tp_scatter import (
                DEFAULT_BLOCK_E,
                DEFAULT_ROWS,
                chunked_conv,
                layout_key,
            )

            layout = data.get(layout_key())
            sh = data[_keys.EDGE_ATTRS_KEY]
            E_pal = sh.shape[0]
            G = E_pal // DEFAULT_BLOCK_E
            _chunk_ok = (
                isinstance(layout, dict)
                and layout.get("take_idx", 0) is None
                and num_nodes % DEFAULT_ROWS == 0
                and E_pal % DEFAULT_BLOCK_E == 0
                and G % n_chunks == 0
            )
            if not _chunk_ok:
                _warn_chunk_fallback(
                    "primal conv", n_chunks,
                    f"identity_layout={isinstance(layout, dict) and layout.get('take_idx', 0) is None}, "
                    f"G={G}, G%chunks={G % n_chunks if n_chunks else '-'}, "
                    f"N%rows={num_nodes % DEFAULT_ROWS}, E%blockE={E_pal % DEFAULT_BLOCK_E}",
                )
            if _chunk_ok:
                msg = chunked_conv(
                    self.tp_scatter.tp, self.edge_mlp, params["edge_mlp"],
                    x, sh, data[_keys.EDGE_EMBEDDING_KEY],
                    data[_keys.EDGE_INDEX_KEY][1], layout, num_nodes, n_chunks,
                )
                from jax.ad_checkpoint import checkpoint_name

                msg = checkpoint_name(msg, "conv_tp_out")
                msg = self.linear_2(params["linear_2"], self._merge_mid(msg))
                if self.sc is not None:
                    msg = msg + sc
                data[_keys.NODE_FEATURES_KEY] = msg
                return data

        if use_fully_fused:
            # radial MLP fused into the kernel: the [E, weight_numel] radial
            # weights never materialize in HBM
            from ..ops.pallas.tp_scatter import (
                bwd_block_e,
                fused_tp_scatter_mlp,
                layout_key,
            )

            mlp_p = {k: v.astype(x.dtype) for k, v in params["edge_mlp"].items()}
            x = fused_tp_scatter_mlp(
                self.tp_scatter.tp,
                self.edge_mlp,
                x,
                data[_keys.EDGE_ATTRS_KEY],
                data[_keys.EDGE_EMBEDDING_KEY],
                mlp_p,
                data[_keys.EDGE_INDEX_KEY][0],
                data[_keys.EDGE_INDEX_KEY][1],
                data.get(_keys.EDGE_MASK_KEY),
                num_nodes,
                layouts=(
                    data.get(layout_key()),
                    data.get(layout_key(block_e=bwd_block_e())),
                ),
            )
        else:
            layout = None
            if self.tp_scatter.impl in ("pallas", "pallas_fused"):
                from ..ops.pallas.tp_scatter import layout_key

                layout = data.get(layout_key())
            edge_weight = self.edge_mlp(params["edge_mlp"], data[_keys.EDGE_EMBEDDING_KEY])
            x = self.tp_scatter.forward_tp_scatter(
                x=x,
                edge_attr=data[_keys.EDGE_ATTRS_KEY],
                edge_weight=edge_weight,
                edge_dst=data[_keys.EDGE_INDEX_KEY][0],
                edge_src=data[_keys.EDGE_INDEX_KEY][1],
                edge_mask=data.get(_keys.EDGE_MASK_KEY),
                num_nodes=num_nodes,
                layout=layout,
            )

        # name the TP output for the "save_tp" remat policy: per-layer
        # checkpointing can then save ONLY this (the expensive-to-recompute
        # kernel result) and rematerialize the cheap node-level tail
        from jax.ad_checkpoint import checkpoint_name

        x = checkpoint_name(x, "conv_tp_out")

        x = self.linear_2(params["linear_2"], self._merge_mid(x))

        if self.sc is not None:
            x = x + sc

        data[_keys.NODE_FEATURES_KEY] = x
        return data

    # ------------------------------------------------------------------
    def jvp(self, params: Params, data: dict, tangents: dict):
        """Hand-written forward-mode rule (see GraphModule.jvp).

        The TP-scatter is trilinear in (node features, edge attrs, radial
        weights), so its position-tangent is three calls to the SAME
        kernels that compute the primal:

            d msg = K(dx, sh, w) + K(x, dsh, w) + K(x, sh, dw),
            dw    = d MLP(emb) . demb  (plain XLA)

        Each call is closed under reverse-mode AD via its custom VJP, so
        ``jax.grad`` of anything built on this sweep works — forward-mode
        AD machinery never enters a kernel.  Everything else in the block
        (linears, sc, norm, gate) is linear or pure XLA.

        Diagnostic: ``NEQUIP_FR_ABLATE`` (comma list of ``tx``/``tsh``/
        ``temb``) drops tangent terms for memory/time attribution runs
        (``tools/train_memory.py``).  NOT for production — gradients are
        wrong with any term ablated.
        """
        import os as _os

        import jax.numpy as jnp

        _ablate = set(
            filter(None, _os.environ.get("NEQUIP_FR_ABLATE", "").split(","))
        )

        x = data[_keys.NODE_FEATURES_KEY]
        tx = tangents.get(_keys.NODE_FEATURES_KEY)
        num_nodes = x.shape[0]
        n_attrs = data[_keys.NODE_ATTRS_KEY]
        # type-embedding attrs are position-independent, but upstream
        # default-jvp modules materialize dense-zero tangents for them —
        # support the (bilinear) term rather than assuming absence
        t_attrs = tangents.get(_keys.NODE_ATTRS_KEY)

        if self.sc is not None:
            w_sc = params["sc"].astype(x.dtype)
            sc = self.sc(x, n_attrs, w_sc)
            t_sc = self.sc(tx, n_attrs, w_sc) if tx is not None else None
            if t_attrs is not None:
                term = self.sc(x, t_attrs, w_sc)
                t_sc = term if t_sc is None else t_sc + term

        x = self.linear_1(params["linear_1"], x)
        if tx is not None:
            tx = self.linear_1(params["linear_1"], tx)

        # avg-num-neighbor norm (+ per-layer ghost exchange): linear in the
        # feature field — apply the same maps to the tangent line
        def _feature_maps(feat):
            d = dict(data)
            d[_keys.NODE_FEATURES_KEY] = feat
            d = self.avg_num_neighbors_norm({}, d)
            if not self.is_first_layer:
                d = self.ghost_exchange({}, d)
            return d[_keys.NODE_FEATURES_KEY]

        x = _feature_maps(x)
        if tx is not None:
            tx = _feature_maps(tx)

        sh = data[_keys.EDGE_ATTRS_KEY]
        tsh = tangents.get(_keys.EDGE_ATTRS_KEY)
        emb = data[_keys.EDGE_EMBEDDING_KEY]
        temb = tangents.get(_keys.EDGE_EMBEDDING_KEY)
        edge_dst = data[_keys.EDGE_INDEX_KEY][0]
        edge_src = data[_keys.EDGE_INDEX_KEY][1]
        edge_mask = data.get(_keys.EDGE_MASK_KEY)

        use_fully_fused = (
            self.tp_scatter.impl == "pallas_fused"
            and self.edge_mlp.num_layers == 2
            and not self.edge_mlp.bias
            and self.edge_mlp.nonlinearity == "silu"
            and self.edge_mlp.parametrization is None
        )
        layout = None
        layouts = None
        if self.tp_scatter.impl in ("pallas", "pallas_fused"):
            from ..ops.pallas.tp_scatter import bwd_block_e, layout_key

            layout = data.get(layout_key())
            layouts = (layout, data.get(layout_key(block_e=bwd_block_e())))

        # edge-chunked dual sweep (NEQUIP_FR_EDGE_CHUNKS=C): scan the four
        # kernel terms over C slices of the relaid edge stream so the
        # per-layer backward window's [E, *] transients shrink to 1/C —
        # what lets 100k-atom f32 force training fit single-chip HBM
        # (ops/pallas/tp_scatter.py chunked_jvp_conv).  Requires the
        # identity layout (GraphModel relayout) and a chunk-divisible
        # stream; silently falls back to the unchunked sweep otherwise.
        n_chunks = int(_os.environ.get("NEQUIP_FR_EDGE_CHUNKS", "0") or 0)
        if (
            n_chunks > 1
            and tx is not None
            and tsh is not None
            and temb is not None
            and isinstance(layout, dict)
            and layout.get("take_idx", 0) is None
        ):
            from ..ops.pallas.tp_scatter import (
                DEFAULT_BLOCK_E,
                DEFAULT_ROWS,
                chunked_jvp_conv,
            )

            E_pal = sh.shape[0]
            G = E_pal // DEFAULT_BLOCK_E
            _chunk_ok = (
                num_nodes % DEFAULT_ROWS == 0
                and E_pal % DEFAULT_BLOCK_E == 0
                and G % n_chunks == 0
            )
            if not _chunk_ok:
                _warn_chunk_fallback(
                    "dual-sweep (jvp)", n_chunks,
                    f"G={G}, G%chunks={G % n_chunks}, "
                    f"N%rows={num_nodes % DEFAULT_ROWS}, E%blockE={E_pal % DEFAULT_BLOCK_E}",
                )
            if _chunk_ok:
                msg, tmsg = chunked_jvp_conv(
                    self.tp_scatter.tp, self.edge_mlp, params["edge_mlp"],
                    x, tx, sh, tsh, emb, temb, edge_src, layout,
                    num_nodes, n_chunks,
                )
                x_out = self.linear_2(params["linear_2"], self._merge_mid(msg))
                tx_out = self.linear_2(params["linear_2"], self._merge_mid(tmsg))
                if self.sc is not None:
                    x_out = x_out + sc
                    if t_sc is not None:
                        tx_out = tx_out + t_sc
                out = dict(data)
                out[_keys.NODE_FEATURES_KEY] = x_out
                t_out = dict(tangents)
                t_out[_keys.NODE_FEATURES_KEY] = tx_out
                return out, t_out
        elif (
            n_chunks > 1 and tx is not None and tsh is not None and temb is not None
        ):
            _warn_chunk_fallback(
                "dual-sweep (jvp)", n_chunks,
                "edge stream not in identity layout (relayout disabled?)",
            )

        if use_fully_fused:
            from ..ops.pallas.tp_scatter import fused_tp_scatter_mlp

            mlp_p = {k: v.astype(x.dtype) for k, v in params["edge_mlp"].items()}

            def K(xx, ss):
                return fused_tp_scatter_mlp(
                    self.tp_scatter.tp, self.edge_mlp, xx, ss, emb, mlp_p,
                    edge_dst, edge_src, edge_mask, num_nodes, layouts=layouts,
                )

            msg = K(x, sh)
            terms = []
            if tx is not None and "tx" not in _ablate:
                terms.append(K(tx, sh))
            if tsh is not None and "tsh" not in _ablate:
                terms.append(K(x, tsh))
            if temb is not None and "temb" not in _ablate:
                _, dw = jax.jvp(
                    lambda e: self.edge_mlp(params["edge_mlp"], e), (emb,), (temb,)
                )
                terms.append(
                    self.tp_scatter.forward_tp_scatter(
                        x=x, edge_attr=sh, edge_weight=dw.astype(x.dtype),
                        edge_dst=edge_dst, edge_src=edge_src,
                        edge_mask=edge_mask, num_nodes=num_nodes, layout=layout,
                    )
                )
        else:
            edge_weight = self.edge_mlp(params["edge_mlp"], emb)

            def K(xx, ss, ww):
                return self.tp_scatter.forward_tp_scatter(
                    x=xx, edge_attr=ss, edge_weight=ww,
                    edge_dst=edge_dst, edge_src=edge_src,
                    edge_mask=edge_mask, num_nodes=num_nodes, layout=layout,
                )

            msg = K(x, sh, edge_weight)
            terms = []
            if tx is not None and "tx" not in _ablate:
                terms.append(K(tx, sh, edge_weight))
            if tsh is not None and "tsh" not in _ablate:
                terms.append(K(x, tsh, edge_weight))
            if temb is not None and "temb" not in _ablate:
                _, dw = jax.jvp(
                    lambda e: self.edge_mlp(params["edge_mlp"], e), (emb,), (temb,)
                )
                terms.append(K(x, sh, dw))
        tmsg = None
        if terms:
            tmsg = terms[0]
            for t in terms[1:]:
                tmsg = tmsg + t

        x_out = self.linear_2(params["linear_2"], self._merge_mid(msg))
        tx_out = (
            self.linear_2(params["linear_2"], self._merge_mid(tmsg))
            if tmsg is not None
            else None
        )
        if self.sc is not None:
            x_out = x_out + sc
            if t_sc is not None:
                tx_out = t_sc if tx_out is None else tx_out + t_sc

        out = dict(data)
        out[_keys.NODE_FEATURES_KEY] = x_out
        t_out = dict(tangents)
        if tx_out is not None:
            t_out[_keys.NODE_FEATURES_KEY] = tx_out
        else:
            t_out.pop(_keys.NODE_FEATURES_KEY, None)
        return out, t_out

    def __repr__(self):
        return (
            f"InteractionBlock({self.irreps_in[_keys.NODE_FEATURES_KEY]} -> "
            f"{self.irreps_out[_keys.NODE_FEATURES_KEY]}, sc={self.use_sc})"
        )
