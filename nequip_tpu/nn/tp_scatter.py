"""TensorProductScatter: gather -> CG tensor product -> scatter-sum.

The hottest op in the network (parity:
``/root/reference/nequip/nn/_tp_scatter_base.py:9-38`` and the OEQ/cuEq fused
CUDA kernels ``_tp_scatter_{oeq,cueq}.py``).

Two interchangeable implementations, selected like the reference's model
modifiers (``enable_OpenEquivariance``):

* ``xla``   — gather + einsum TP + masked ``segment_sum``; always correct,
  arbitrarily differentiable.  XLA fuses the gather and elementwise work into
  the contraction; with ir_mul layout the CG contractions are batched
  matmuls on the MXU.
* ``pallas`` — fused kernel that streams edge blocks through VMEM
  (``nequip_tpu.ops.pallas.tp_scatter``), avoiding the [E, mid_dim] HBM
  round-trip.  Used on TPU for large graphs.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..data import _keys
from ..ops.irreps import Irreps
from ..ops.scatter import scatter_sum
from ..ops.tensor_product import TensorProduct
from .module import GraphModule, Params


class TensorProductScatter(GraphModule):
    def __init__(
        self,
        feature_irreps_in,
        irreps_edge_attr,
        irreps_mid,
        instructions,
        impl: str = "xla",
    ):
        super().__init__()
        self.feature_irreps_in = Irreps(feature_irreps_in)
        self.irreps_edge_attr = Irreps(irreps_edge_attr)
        self.irreps_mid = Irreps(irreps_mid)
        self.tp = TensorProduct(
            self.feature_irreps_in,
            self.irreps_edge_attr,
            self.irreps_mid,
            instructions,
            shared_weights=False,
        )
        self.impl = impl

    @property
    def weight_numel(self) -> int:
        return self.tp.weight_numel

    def forward_tp_scatter(
        self,
        x: jnp.ndarray,  # (N, dim_in) node features
        edge_attr: jnp.ndarray,  # (E, sh_dim)
        edge_weight: jnp.ndarray,  # (E, weight_numel)
        edge_dst: jnp.ndarray,  # (E,)
        edge_src: jnp.ndarray,  # (E,)
        edge_mask: Optional[jnp.ndarray],  # (E,) bool or None
        num_nodes: int,
        layout=None,  # optional precomputed edge layout (compute_edge_layout)
    ) -> jnp.ndarray:
        if self.impl in ("pallas", "pallas_fused"):
            from ..ops.pallas.tp_scatter import fused_tp_scatter

            return fused_tp_scatter(
                self.tp, x, edge_attr, edge_weight, edge_dst, edge_src,
                edge_mask, num_nodes, layout=layout,
            )
        x_src = jnp.take(x, edge_src, axis=0)
        messages = self.tp(x_src, edge_attr, edge_weight)
        return scatter_sum(messages, edge_dst, num_segments=num_nodes, mask=edge_mask)

    def __call__(self, params: Params, data: dict) -> dict:  # pragma: no cover
        raise RuntimeError(
            "TensorProductScatter is used through InteractionBlock, not standalone"
        )

    def __repr__(self):
        return (
            f"TensorProductScatter({self.feature_irreps_in} x "
            f"{self.irreps_edge_attr} -> {self.irreps_mid}, impl={self.impl})"
        )
