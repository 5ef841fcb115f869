"""Atomwise operations: linear readouts, graph reduction, per-type scale/shift.

Parity: ``/root/reference/nequip/nn/atomwise.py``.  Padding contract:
``AtomwiseReduce`` masks padded nodes before the segment reduction, and
``PerTypeScaleShift`` performs the scale/shift in the global (accumulation)
dtype like the reference's float64 policy (float64 on CPU/x64, float32 on
TPU — see ``utils/global_state.py``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import numpy as np
import jax.numpy as jnp

from ..data import _keys
from ..data._key_registry import get_field_type
from ..ops.irreps import Irreps
from ..ops.linear import Linear
from ..ops.scatter import scatter_sum
from ..utils.global_state import global_dtype
from .module import GraphModule, Params


class AtomwiseOperation(GraphModule):
    """Apply an arbitrary per-atom operation object to a field.

    Parity: ``AtomwiseOperation`` (``atomwise.py:17-30``).  ``operation``
    must expose ``irreps_in``/``irreps_out`` and be callable; if it has
    ``init``, its params live under this module.
    """

    def __init__(self, operation, field: str, irreps_in=None):
        super().__init__()
        self.operation = operation
        self.field = field
        self._init_irreps(
            irreps_in=irreps_in,
            my_irreps_in={field: getattr(operation, "irreps_in", None)},
            irreps_out={field: getattr(operation, "irreps_out", None)},
        )

    def init(self, rng) -> Params:
        if hasattr(self.operation, "init"):
            return self.operation.init(rng)
        return {}

    def __call__(self, params: Params, data: dict) -> dict:
        data = dict(data)
        try:
            data[self.field] = self.operation(params, data[self.field])
        except TypeError:
            data[self.field] = self.operation(data[self.field])
        return data


class AtomwiseLinear(GraphModule):
    def __init__(
        self,
        field: str = _keys.NODE_FEATURES_KEY,
        out_field: Optional[str] = None,
        irreps_in=None,
        irreps_out=None,
    ):
        super().__init__()
        self.field = field
        self.out_field = out_field if out_field is not None else field
        if irreps_out is None:
            irreps_out = Irreps(irreps_in[field])
        self._init_irreps(
            irreps_in=irreps_in,
            required_irreps_in=[field],
            irreps_out={self.out_field: Irreps(irreps_out)},
        )
        self.linear = Linear(self.irreps_in[field], self.irreps_out[self.out_field])

    def init(self, rng) -> Params:
        return self.linear.init(rng)

    def __call__(self, params: Params, data: dict) -> dict:
        data = dict(data)
        data[self.out_field] = self.linear(params, data[self.field])
        return data

    def jvp(self, params: Params, data: dict, tangents: dict):
        """Hand jvp rule: ``ops.Linear`` carries a custom VJP (which blocks
        forward-mode AD), but the map is linear in the field — the tangent
        goes through the same apply."""
        out = self(params, data)
        t_out = dict(tangents)
        t_in = tangents.get(self.field)
        if t_in is not None:
            t_out[self.out_field] = self.linear(params, t_in)
        elif self.out_field != self.field:
            t_out.pop(self.out_field, None)
        return out, t_out


class AtomwiseReduce(GraphModule):
    """Sum (or mean / normalized-sum) a node field into a per-frame field."""

    def __init__(
        self,
        field: str,
        out_field: Optional[str] = None,
        reduce: str = "sum",
        avg_num_atoms: Optional[float] = None,
        irreps_in=None,
    ):
        super().__init__()
        assert reduce in ("sum", "mean", "normalized_sum")
        self.constant = 1.0
        if reduce == "normalized_sum":
            assert avg_num_atoms is not None
            self.constant = float(avg_num_atoms) ** -0.5
            reduce = "sum"
        self.reduce = reduce
        self.field = field
        self.out_field = f"{reduce}_{field}" if out_field is None else out_field
        self._init_irreps(
            irreps_in=irreps_in,
            irreps_out=(
                {self.out_field: (irreps_in or {})[self.field]}
                if field in (irreps_in or {})
                else {}
            ),
        )

    def __call__(self, params: Params, data: dict) -> dict:
        field = data[self.field]
        num_frames = data[_keys.NUM_NODES_KEY].shape[0]
        batch = data[_keys.BATCH_KEY].reshape(-1)
        mask = data.get(_keys.NODE_MASK_KEY)
        if self.reduce == "sum":
            result = scatter_sum(field, batch, num_segments=num_frames, mask=mask)
        else:  # mean
            total = scatter_sum(field, batch, num_segments=num_frames, mask=mask)
            ones = jnp.ones(field.shape[:1], dtype=field.dtype)
            count = scatter_sum(ones, batch, num_segments=num_frames, mask=mask)
            result = total / jnp.maximum(count, 1)[:, None]
        if self.constant != 1.0:
            result = result * self.constant
        data = dict(data)
        data[self.out_field] = result
        return data

    def __repr__(self):
        return f"AtomwiseReduce({self.field} -> {self.out_field}, {self.reduce})"


class PerTypeScaleShift(GraphModule):
    """out = shift[type] + scale[type] * in, computed in the global dtype.

    Parity: ``PerTypeScaleShift`` (``atomwise.py:116-378``) including the
    single-value shortcut and trainable promotion to per-type vectors.
    """

    def __init__(
        self,
        type_names: List[str],
        field: str,
        out_field: Optional[str] = None,
        scales: Optional[Union[float, Dict[str, float]]] = None,
        shifts: Optional[Union[float, Dict[str, float]]] = None,
        scales_trainable: bool = False,
        shifts_trainable: bool = False,
        irreps_in=None,
    ):
        super().__init__()
        self.type_names = list(type_names)
        self.num_types = len(type_names)
        self.field = field
        self.out_field = field if out_field is None else out_field
        assert get_field_type(self.field) == "node"
        assert get_field_type(self.out_field) == "node"
        self._init_irreps(
            irreps_in=irreps_in,
            my_irreps_in={self.field: Irreps("1x0e")},
            irreps_out={self.out_field: Irreps(irreps_in[self.field])},
        )

        def _prep(v, trainable):
            if v is None:
                return None
            if isinstance(v, (int, float)):
                vals = np.array([float(v)])
                if trainable:
                    vals = np.full(self.num_types, float(v))
            elif isinstance(v, dict):
                assert set(self.type_names) == set(v.keys()), (
                    f"per-type values {sorted(v)} must cover type_names {self.type_names}"
                )
                vals = np.array([float(v[k]) for k in self.type_names])
            elif isinstance(v, (list, tuple, np.ndarray)):
                vals = np.asarray(v, dtype=float).reshape(-1)
                assert vals.size in (1, self.num_types)
                if trainable and vals.size == 1:
                    vals = np.full(self.num_types, vals[0])
            else:
                raise TypeError(type(v))
            return vals.reshape(-1, 1)

        self._scales = _prep(scales, scales_trainable)
        self._shifts = _prep(shifts, shifts_trainable)
        self.has_scales = self._scales is not None
        self.has_shifts = self._shifts is not None
        self.scales_trainable = scales_trainable
        self.shifts_trainable = shifts_trainable

    def init(self, rng) -> Params:
        params = {}
        if self.has_scales:
            params["scales"] = jnp.asarray(self._scales)
        if self.has_shifts:
            params["shifts"] = jnp.asarray(self._shifts)
        return params

    def frozen_param_paths(self):
        out = set()
        if self.has_scales and not self.scales_trainable:
            out.add("scales")
        if self.has_shifts and not self.shifts_trainable:
            out.add("shifts")
        return out

    def __call__(self, params: Params, data: dict) -> dict:
        out_dtype = global_dtype()
        x = data[self.field].astype(out_dtype)
        data = dict(data)
        if not (self.has_scales or self.has_shifts):
            data[self.out_field] = x
            return data
        types = data[_keys.ATOM_TYPE_KEY].reshape(-1)

        def _lookup(v):
            v = v.astype(out_dtype)
            if v.shape[0] == 1:
                return v  # broadcast shortcut
            return jnp.take(v, types, axis=0)

        if self.has_scales:
            x = _lookup(params["scales"]) * x
        if self.has_shifts:
            x = _lookup(params["shifts"]) + x
        data[self.out_field] = x
        return data

    def current_values(self, params: Params):
        """(scales, shifts) as per-type numpy vectors (for modifiers/repr)."""
        def expand(v):
            if v is None:
                return None
            v = np.asarray(v).reshape(-1)
            if v.size == 1:
                v = np.full(self.num_types, v[0])
            return v

        return (
            expand(params.get("scales") if self.has_scales else None),
            expand(params.get("shifts") if self.has_shifts else None),
        )

    def __repr__(self):
        fmt = lambda v: "None" if v is None else np.array2string(
            np.asarray(v).reshape(-1), precision=6
        )
        return (
            f"PerTypeScaleShift(scales={fmt(self._scales)}, shifts={fmt(self._shifts)})"
        )
