"""Average-number-of-neighbors feature normalization.

Parity: ``AvgNumNeighborsNorm`` (``/root/reference/nequip/nn/norm.py:7-68``):
multiply node features by 1/sqrt(avg_num_neighbors), globally or per type,
with the per-node factor cached in the data dict across layers.
"""

from __future__ import annotations

from math import sqrt
from typing import Dict, Optional, Sequence, Union

import numpy as np
import jax.numpy as jnp

from ..data import _keys
from .module import GraphModule, Params


class AvgNumNeighborsNorm(GraphModule):
    def __init__(
        self,
        avg_num_neighbors: Union[float, Dict[str, float]],
        type_names: Optional[Sequence[str]] = None,
        irreps_in=None,
    ):
        super().__init__()
        assert avg_num_neighbors is not None, "avg_num_neighbors must be specified"
        if isinstance(avg_num_neighbors, (int, float)):
            consts = [float(avg_num_neighbors)]
        elif isinstance(avg_num_neighbors, dict):
            assert type_names is not None and set(type_names) == set(avg_num_neighbors)
            consts = [float(avg_num_neighbors[k]) for k in type_names]
        else:
            raise TypeError("avg_num_neighbors must be a float or dict")
        self._norm_const = np.array([1.0 / sqrt(n) for n in consts]).reshape(-1, 1)
        self.shortcut = self._norm_const.size == 1
        self._init_irreps(irreps_in=irreps_in)

    def __call__(self, params: Params, data: dict) -> dict:
        feats = data[_keys.NODE_FEATURES_KEY]
        data = dict(data)
        if self.shortcut:
            factor = jnp.asarray(self._norm_const[0, 0], dtype=feats.dtype)
            data[_keys.NODE_FEATURES_KEY] = feats * factor
            return data
        if _keys.FEATURE_NORM_FACTOR_KEY in data:
            factor = data[_keys.FEATURE_NORM_FACTOR_KEY]
        else:
            table = jnp.asarray(self._norm_const, dtype=feats.dtype)
            factor = jnp.take(table, data[_keys.ATOM_TYPE_KEY].reshape(-1), axis=0)
            data[_keys.FEATURE_NORM_FACTOR_KEY] = factor
        data[_keys.NODE_FEATURES_KEY] = factor * feats
        return data
