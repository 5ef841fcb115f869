"""Small utility graph modules.

Parity: ``/root/reference/nequip/nn/misc.py`` (``ApplyFactor``, ``Concat``,
``SaveForOutput``).
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp

from ..ops.irreps import Irreps
from .module import GraphModule, Params


class ApplyFactor(GraphModule):
    """Multiply a field by a compile-time constant (e.g. the 2*pi/r_max^2
    Bessel back-compat factor wired at ``model/nequip_models.py:317-322``)."""

    def __init__(self, in_field: str, factor: float, out_field: Optional[str] = None, irreps_in=None):
        super().__init__()
        self.in_field = in_field
        self.out_field = out_field if out_field is not None else in_field
        self.factor = float(factor)
        self._init_irreps(
            irreps_in=irreps_in,
            required_irreps_in=[in_field],
            irreps_out={self.out_field: (irreps_in or {}).get(in_field)},
        )

    def __call__(self, params: Params, data: dict) -> dict:
        data = dict(data)
        data[self.out_field] = data[self.in_field] * self.factor
        return data

    def __repr__(self):
        return f"ApplyFactor({self.in_field} * {self.factor:g} -> {self.out_field})"


class Concat(GraphModule):
    """Concatenate multiple fields along the feature dimension."""

    def __init__(self, in_fields: List[str], out_field: str, irreps_in=None):
        super().__init__()
        self.in_fields = list(in_fields)
        self.out_field = out_field
        self._init_irreps(irreps_in=irreps_in, required_irreps_in=self.in_fields)
        irreps = Irreps()
        for f in self.in_fields:
            irreps = irreps + self.irreps_in[f]
        self.irreps_out[self.out_field] = irreps

    def __call__(self, params: Params, data: dict) -> dict:
        data = dict(data)
        data[self.out_field] = jnp.concatenate(
            [data[f] for f in self.in_fields], axis=-1
        )
        return data


class SaveForOutput(GraphModule):
    """Copy a field to another name so later modules cannot overwrite it."""

    def __init__(self, field: str, out_field: str, irreps_in=None):
        super().__init__()
        self.field = field
        self.out_field = out_field
        self._init_irreps(
            irreps_in=irreps_in,
            required_irreps_in=[field],
            irreps_out={out_field: (irreps_in or {}).get(field)},
        )

    def __call__(self, params: Params, data: dict) -> dict:
        data = dict(data)
        data[self.out_field] = data[self.field]
        return data
