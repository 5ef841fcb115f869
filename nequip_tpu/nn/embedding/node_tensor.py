"""Vector-field node embeddings: append solid-harmonic embeddings of node or
per-graph vector fields (spins, external E-fields) to node features.

Parity: ``AppendVectorFieldEmbed``
(``/root/reference/nequip/nn/embedding/node_tensor.py:14-171``): the vector's
direction enters as l=1 (or higher) spherical-harmonic features, parity-aware
(polar vs axial vectors), and the magnitude as an even scalar channel.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ...data import _keys
from ...data._key_registry import _GRAPH_FIELDS, _NODE_FIELDS
from ...ops.irreps import Irrep, Irreps, MulIrrep
from ...ops.spherical import spherical_harmonics
from ..module import GraphModule, Params


class AppendVectorFieldEmbed(GraphModule):
    """Append SH(v) * |v| features of a vector field to NODE_FEATURES.

    Args:
        field: a registered node field ``(N, 3)`` or graph field ``(F, 3)``
            (broadcast to nodes via the batch index)
        lmax: highest SH degree of the embedding (default 1)
        axial: ``True`` for pseudo-vectors (spins, magnetic fields) whose
            l=1 part is even under parity; ``False`` for polar vectors.
    """

    def __init__(
        self,
        field: str,
        lmax: int = 1,
        axial: bool = False,
        irreps_in=None,
    ):
        super().__init__()
        self.field = field
        self.lmax = int(lmax)
        self.axial = bool(axial)
        assert field in _NODE_FIELDS or field in _GRAPH_FIELDS, (
            f"{field!r} must be a registered node or graph field"
        )
        self.is_graph_field = field in _GRAPH_FIELDS

        irreps_in = dict(irreps_in or {})
        irreps_in.setdefault(self.field, None)
        in_feats = Irreps(irreps_in[_keys.NODE_FEATURES_KEY])
        base_p = 1 if self.axial else -1
        sh_irreps = Irreps(
            [MulIrrep(1, Irrep(l, base_p**l)) for l in range(self.lmax + 1)]
        )
        self.sh_irreps = sh_irreps
        out = in_feats + sh_irreps
        self._init_irreps(
            irreps_in=irreps_in,
            required_irreps_in=[_keys.NODE_FEATURES_KEY],
            irreps_out={_keys.NODE_FEATURES_KEY: out},
        )

    def __call__(self, params: Params, data: dict) -> dict:
        vec = data[self.field]
        if self.is_graph_field:
            batch = data[_keys.BATCH_KEY].reshape(-1)
            vec = jnp.take(vec.reshape(-1, 3), batch, axis=0)
        vec = vec.reshape(-1, 3)
        mag = jnp.sqrt(jnp.sum(vec * vec, axis=-1, keepdims=True) + 1e-30)
        sh = spherical_harmonics(self.lmax, vec, normalize=True)
        # scale by magnitude so zero fields embed to zero (l=0 channel keeps
        # the magnitude itself)
        emb = (sh * mag).astype(self.model_dtype)
        data = dict(data)
        data[_keys.NODE_FEATURES_KEY] = jnp.concatenate(
            [data[_keys.NODE_FEATURES_KEY], emb], axis=-1
        )
        return data
