"""Convolution layer: interaction block + gated equivariant nonlinearity.

Parity: ``ConvNetLayer`` (``/root/reference/nequip/nn/convnetlayer.py:26-170``),
including CG-path-existence pruning of the hidden irreps and the gate parity
selection rules.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

from ..data import _keys
from ..ops.gate import Gate, NormActivation
from ..ops.irreps import Irrep, Irreps, tp_path_exists
from .interaction_block import InteractionBlock
from .module import GraphModule, Params


class ConvNetLayer(GraphModule):
    def __init__(
        self,
        irreps_in,
        feature_irreps_hidden,
        convolution=InteractionBlock,
        convolution_kwargs: Optional[Dict[str, Any]] = None,
        resnet: bool = False,
        remat: bool = False,
        nonlinearity_type: str = "gate",
        nonlinearity_scalars: Dict[str, str] = {"e": "silu", "o": "tanh"},
        nonlinearity_gates: Dict[str, str] = {"e": "silu", "o": "tanh"},
    ):
        super().__init__()
        assert nonlinearity_type in ("gate", "norm")
        assert remat in (False, True, "save_tp"), remat
        self.remat = remat
        nl_scalars = {1: nonlinearity_scalars["e"], -1: nonlinearity_scalars["o"]}
        nl_gates = {1: nonlinearity_gates["e"], -1: nonlinearity_gates["o"]}
        convolution_kwargs = dict(convolution_kwargs or {})

        self.feature_irreps_hidden = Irreps(feature_irreps_hidden)
        self._init_irreps(
            irreps_in=irreps_in, required_irreps_in=[_keys.NODE_FEATURES_KEY]
        )

        edge_attr_irreps = self.irreps_in[_keys.EDGE_ATTRS_KEY]
        irreps_prev = self.irreps_in[_keys.NODE_FEATURES_KEY]

        irreps_scalars = Irreps(
            [
                mi
                for mi in self.feature_irreps_hidden
                if mi.ir.l == 0 and tp_path_exists(irreps_prev, edge_attr_irreps, mi.ir)
            ]
        )
        irreps_gated = Irreps(
            [
                mi
                for mi in self.feature_irreps_hidden
                if mi.ir.l > 0 and tp_path_exists(irreps_prev, edge_attr_irreps, mi.ir)
            ]
        )
        irreps_layer_out = (irreps_scalars + irreps_gated).simplify()

        if nonlinearity_type == "gate":
            gate_ir = (
                Irrep(0, 1)
                if tp_path_exists(irreps_prev, edge_attr_irreps, "0e")
                else Irrep(0, -1)
            )
            irreps_gates = Irreps([(mi.mul, gate_ir) for mi in irreps_gated])
            self.equivariant_nonlin = Gate(
                irreps_scalars=irreps_scalars,
                act_scalars=[nl_scalars[mi.ir.p] for mi in irreps_scalars],
                irreps_gates=irreps_gates,
                act_gates=[nl_gates[mi.ir.p] for mi in irreps_gates],
                irreps_gated=irreps_gated,
            )
            conv_irreps_out = self.equivariant_nonlin.irreps_in.simplify()
        else:
            conv_irreps_out = irreps_layer_out.simplify()
            self.equivariant_nonlin = NormActivation(
                conv_irreps_out, scalar_nonlinearity=nl_scalars[1]
            )

        self.resnet = bool(resnet) and (
            self.equivariant_nonlin.irreps_out == irreps_prev
        )

        convolution_kwargs.pop("irreps_in", None)
        convolution_kwargs.pop("irreps_out", None)
        self.conv = convolution(
            irreps_in=self.irreps_in, irreps_out=conv_irreps_out, **convolution_kwargs
        )

        self.irreps_out.update(self.conv.irreps_out)
        self.irreps_out[_keys.NODE_FEATURES_KEY] = self.equivariant_nonlin.irreps_out

    def init(self, rng) -> Params:
        return {"conv": self.conv.init(rng)}

    def _apply(self, params: Params, data: dict) -> dict:
        old_x = data[_keys.NODE_FEATURES_KEY]
        data = self.conv(params["conv"], data)
        x = self.equivariant_nonlin(data[_keys.NODE_FEATURES_KEY])
        if self.resnet:
            x = old_x + x
        data[_keys.NODE_FEATURES_KEY] = x
        return data

    def __call__(self, params: Params, data: dict) -> dict:
        if self.remat == "save_tp":
            # middle ground for 100k+ force calls: save ONLY the TP-kernel
            # output (checkpoint_name'd in InteractionBlock) and the layer
            # inputs; the node-level tail (merge/linear_2/sc/gate) and the
            # cheap layer head are rematerialized, but the expensive fused
            # TP forward is NOT re-run (its only output is the saved value,
            # so the recompute trace DCEs the kernel call).  Costs one
            # [N, mid_dim] residual per layer instead of full-remat's ~30%
            # step-time recompute.
            import jax

            return jax.checkpoint(
                self._apply,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "conv_tp_out"
                ),
            )(params, data)
        if self.remat:
            # rematerialize the whole conv layer in the backward pass:
            # trades recompute for HBM (needed for 100k+ atom force calls)
            import jax

            return jax.checkpoint(self._apply)(params, data)
        return self._apply(params, data)

    def _jvp_apply(self, params: Params, data: dict, tangents: dict):
        import jax

        old_x = data[_keys.NODE_FEATURES_KEY]
        t_old = tangents.get(_keys.NODE_FEATURES_KEY)
        data, tangents = self.conv.jvp(params["conv"], data, tangents)
        x = data[_keys.NODE_FEATURES_KEY]
        tx = tangents.get(_keys.NODE_FEATURES_KEY)
        if tx is None:
            x = self.equivariant_nonlin(x)
        else:
            x, tx = jax.jvp(self.equivariant_nonlin, (x,), (tx,))
        if self.resnet:
            x = old_x + x
            if t_old is not None:
                tx = t_old if tx is None else tx + t_old
        data = dict(data)
        data[_keys.NODE_FEATURES_KEY] = x
        tangents = dict(tangents)
        if tx is not None:
            tangents[_keys.NODE_FEATURES_KEY] = tx
        else:
            tangents.pop(_keys.NODE_FEATURES_KEY, None)
        return data, tangents

    def jvp(self, params: Params, data: dict, tangents: dict):
        """Dual-number sweep of the layer (see GraphModule.jvp).

        The sweep is FIRST-order, so per-layer jax.checkpoint here behaves
        exactly like ordinary activation remat — unlike reverse-over-reverse
        training, where per-layer policies cannot bound memory.
        """
        if self.remat:
            import jax

            return jax.checkpoint(self._jvp_apply)(params, data, tangents)
        return self._jvp_apply(params, data, tangents)

    def __repr__(self):
        return (
            f"ConvNetLayer(hidden={self.feature_irreps_hidden}, "
            f"out={self.irreps_out[_keys.NODE_FEATURES_KEY]}, resnet={self.resnet})"
        )
