"""Node type embedding (+ categorical per-graph field embeddings).

Parity: ``NodeTypeEmbed`` (``/root/reference/nequip/nn/embedding/node.py:39-175``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ...data import _keys
from ...data._key_registry import _GRAPH_FIELDS
from ...ops.irreps import Irreps
from ..module import GraphModule, Params


def _init_embedding(rng, num, dim, init: Optional[str]):
    if init in (None, "normal"):
        return jax.random.normal(rng, (num, dim))
    if init == "uniform":
        return jax.random.uniform(rng, (num, dim), minval=-1.0, maxval=1.0)
    if init == "zero":
        return jnp.zeros((num, dim))
    if init == "near_zero":
        return 1e-3 * jax.random.normal(rng, (num, dim))
    raise ValueError(f"unknown embedding init {init!r}")


class NodeTypeEmbed(GraphModule):
    def __init__(
        self,
        type_names: List[str],
        num_features: int,
        type_embed_init: Optional[str] = None,
        set_features: bool = True,
        categorical_graph_field_embed: Optional[List[Dict[str, Any]]] = None,
        irreps_in=None,
    ):
        super().__init__()
        self.type_names = list(type_names)
        self.num_types = len(type_names)
        self.num_features = int(num_features)
        self.set_features = set_features
        self.type_embed_init = type_embed_init

        total = self.num_features
        self.categorical_specs = []
        irreps_in = dict(irreps_in or {})
        for spec in categorical_graph_field_embed or []:
            field = str(spec["field"])
            assert field in _GRAPH_FIELDS, (
                f"{field!r} is not a registered graph field"
            )
            lo, hi = int(spec["min"]), int(spec["max"])
            assert hi >= lo
            self.categorical_specs.append(
                dict(
                    field=field,
                    num_features=int(spec["num_features"]),
                    min=lo,
                    num=hi - lo + 1,
                    init=spec.get("init", None),
                )
            )
            total += int(spec["num_features"])
            irreps_in.setdefault(field, None)

        out_irreps = Irreps([(total, (0, 1))])
        irreps_out = {_keys.NODE_ATTRS_KEY: out_irreps}
        if set_features:
            irreps_out[_keys.NODE_FEATURES_KEY] = out_irreps
        self._init_irreps(irreps_in=irreps_in, irreps_out=irreps_out)

    def init(self, rng) -> Params:
        keys = jax.random.split(rng, 1 + len(self.categorical_specs))
        params = {
            "type_embed": _init_embedding(
                keys[0], self.num_types, self.num_features, self.type_embed_init
            )
        }
        for k, spec in zip(keys[1:], self.categorical_specs):
            params[f"embed_{spec['field']}"] = _init_embedding(
                k, spec["num"], spec["num_features"], spec["init"]
            )
        return params

    def jvp(self, params: Params, data: dict, tangents: dict):
        # reads only integer fields (atom types, categorical graph labels):
        # outputs carry exactly ZERO tangent.  Overriding the default
        # (jax.jvp) prevents dense-zero NODE_ATTRS/NODE_FEATURES tangents
        # from entering the dual sweep — which would cost a wasted kernel
        # call per conv layer downstream (InteractionBlock.jvp runs a
        # K(dx, ...) term whenever a feature tangent is present).
        return self(params, data), dict(tangents)

    def __call__(self, params: Params, data: dict) -> dict:
        types = data[_keys.ATOM_TYPE_KEY].reshape(-1)
        emb = jnp.take(params["type_embed"].astype(self.model_dtype), types, axis=0)
        if self.categorical_specs:
            parts = [emb]
            batch = data[_keys.BATCH_KEY].reshape(-1)
            for spec in self.categorical_specs:
                per_frame = data[spec["field"]].reshape(-1)
                per_node = jnp.take(per_frame, batch, axis=0) - spec["min"]
                table = params[f"embed_{spec['field']}"].astype(self.model_dtype)
                parts.append(jnp.take(table, per_node, axis=0))
            emb = jnp.concatenate(parts, axis=-1)
        data = dict(data)
        data[_keys.NODE_ATTRS_KEY] = emb
        if self.set_features:
            data[_keys.NODE_FEATURES_KEY] = emb
        return data

    def __repr__(self):
        return f"NodeTypeEmbed(types={self.num_types}, features={self.num_features})"
