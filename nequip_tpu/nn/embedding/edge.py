"""Edge embeddings: spherical harmonics, length normalization, Bessel basis.

Parity: ``/root/reference/nequip/nn/embedding/_edge.py`` and ``cutoffs.py``.
Padding contract: masked edges produce exactly-zero edge embedding and
cutoff, so downstream messages vanish (the radial MLP is bias-free, and the
cutoff multiplies every edge energy).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import numpy as np
import jax.numpy as jnp

from ...data import _keys
from ...ops.irreps import Irreps
from ...ops.radial import bessel_basis, polynomial_cutoff
from ...ops.spherical import spherical_harmonics
from ..graph_utils import with_edge_types, with_edge_vectors
from ..module import GraphModule, Params
from .utils import cutoff_dict_to_matrix


class PolynomialCutoff:
    """Config-friendly wrapper for the DimeNet polynomial envelope."""

    def __init__(self, p: float = 6.0):
        assert p >= 2.0
        self.p = float(p)

    def __call__(self, x):
        return polynomial_cutoff(x, self.p)


class SphericalHarmonicEdgeAttrs(GraphModule):
    """edge_attrs = component-normalized SH of the edge unit vector."""

    def __init__(
        self,
        irreps_edge_sh: Union[int, str, Irreps],
        irreps_in=None,
        out_field: str = _keys.EDGE_ATTRS_KEY,
    ):
        super().__init__()
        self.out_field = out_field
        if isinstance(irreps_edge_sh, int):
            self.irreps_edge_sh = Irreps.spherical_harmonics(irreps_edge_sh)
        else:
            self.irreps_edge_sh = Irreps(irreps_edge_sh)
        ls = [mi.ir.l for mi in self.irreps_edge_sh]
        assert ls == list(range(len(ls))), "SH irreps must be 0..lmax"
        self.lmax = max(ls)
        self._init_irreps(
            irreps_in=irreps_in, irreps_out={out_field: self.irreps_edge_sh}
        )

    def __call__(self, params: Params, data: dict) -> dict:
        data = with_edge_vectors(data, with_lengths=False)
        vec = data[_keys.EDGE_VECTORS_KEY]
        sh = spherical_harmonics(self.lmax, vec, normalize=True)
        data[self.out_field] = sh.astype(self.model_dtype)
        return data

    def __repr__(self):
        return f"SphericalHarmonicEdgeAttrs(lmax={self.lmax})"


class EdgeLengthNormalizer(GraphModule):
    """normed_edge_lengths = r / r_max (or per-edge-type cutoff)."""

    def __init__(
        self,
        r_max: float,
        type_names: List[str],
        per_edge_type_cutoff: Optional[Dict[str, Union[float, Dict[str, float]]]] = None,
        edge_type_field: str = _keys.EDGE_TYPE_KEY,
        norm_length_field: str = _keys.NORM_LENGTH_KEY,
        irreps_in=None,
    ):
        super().__init__()
        self.r_max = float(r_max)
        self.type_names = list(type_names)
        self.num_types = len(type_names)
        self.edge_type_field = edge_type_field
        self.norm_length_field = norm_length_field
        self.per_edge_type = per_edge_type_cutoff is not None
        if self.per_edge_type:
            mat = cutoff_dict_to_matrix(per_edge_type_cutoff, self.type_names, self.r_max)
            self._rmax_recip = (1.0 / mat).reshape(-1)  # (n_types^2,), row-major [dst, src]
        else:
            self._rmax_recip = np.array(1.0 / self.r_max)
        irreps_out = {self.norm_length_field: Irreps("1x0e")}
        if self.per_edge_type:
            irreps_out[self.edge_type_field] = None
        self._init_irreps(irreps_in=irreps_in, irreps_out=irreps_out)

    def __call__(self, params: Params, data: dict) -> dict:
        data = with_edge_vectors(data, with_lengths=True)
        r = data[_keys.EDGE_LENGTH_KEY].reshape(-1, 1)
        recip = jnp.asarray(self._rmax_recip, dtype=r.dtype)
        if self.per_edge_type:
            data = with_edge_types(data)
            et = data[self.edge_type_field]
            flat = et[0] * self.num_types + et[1]
            recip = jnp.take(recip, flat, axis=0)[:, None]
        data[self.norm_length_field] = r * recip
        return data

    def __repr__(self):
        return f"EdgeLengthNormalizer(r_max={self.r_max}, per_edge_type={self.per_edge_type})"


class BesselEdgeLengthEncoding(GraphModule):
    """edge_embedding = bessel(normed length) * cutoff envelope.

    Masked (padded) edges get exactly-zero embedding and cutoff.
    """

    def __init__(
        self,
        cutoff: PolynomialCutoff,
        num_bessels: int = 8,
        trainable: bool = False,
        edge_invariant_field: str = _keys.EDGE_EMBEDDING_KEY,
        norm_length_field: str = _keys.NORM_LENGTH_KEY,
        irreps_in=None,
    ):
        super().__init__()
        self.cutoff = cutoff
        self.num_bessels = int(num_bessels)
        self.trainable = trainable
        self.edge_invariant_field = edge_invariant_field
        self.norm_length_field = norm_length_field
        self._init_irreps(
            irreps_in=irreps_in,
            irreps_out={
                self.edge_invariant_field: Irreps([(self.num_bessels, (0, 1))]),
                _keys.EDGE_CUTOFF_KEY: Irreps("1x0e"),
            },
        )

    def init(self, rng) -> Params:
        return {"bessel_weights": jnp.arange(1.0, self.num_bessels + 1.0)}

    def frozen_param_paths(self):
        return set() if self.trainable else {"bessel_weights"}

    def __call__(self, params: Params, data: dict) -> dict:
        x = data[self.norm_length_field]  # (E, 1)
        w = params["bessel_weights"].astype(x.dtype)
        bessel = bessel_basis(x, w).astype(self.model_dtype)
        cutoff = self.cutoff(x).astype(self.model_dtype)
        if _keys.EDGE_MASK_KEY in data:
            mask = data[_keys.EDGE_MASK_KEY][:, None]
            bessel = jnp.where(mask, bessel, 0.0)
            cutoff = jnp.where(mask, cutoff, 0.0)
        data = dict(data)
        data[_keys.EDGE_CUTOFF_KEY] = cutoff
        data[self.edge_invariant_field] = bessel * cutoff
        return data

    def __repr__(self):
        return f"BesselEdgeLengthEncoding(num_bessels={self.num_bessels})"


class AddRadialCutoffToData(GraphModule):
    """Ensure ``edge_cutoff`` exists (for models without a Bessel encoding)."""

    def __init__(self, cutoff: PolynomialCutoff, norm_length_field: str = _keys.NORM_LENGTH_KEY, irreps_in=None):
        super().__init__()
        self.cutoff = cutoff
        self.norm_length_field = norm_length_field
        self._init_irreps(
            irreps_in=irreps_in, irreps_out={_keys.EDGE_CUTOFF_KEY: Irreps("1x0e")}
        )

    def __call__(self, params: Params, data: dict) -> dict:
        if _keys.EDGE_CUTOFF_KEY not in data:
            x = data[self.norm_length_field]
            cutoff = self.cutoff(x).astype(self.model_dtype)
            if _keys.EDGE_MASK_KEY in data:
                cutoff = jnp.where(data[_keys.EDGE_MASK_KEY][:, None], cutoff, 0.0)
            data = dict(data)
            data[_keys.EDGE_CUTOFF_KEY] = cutoff
        return data
