"""Pair potentials: ZBL universal repulsion and Lennard-Jones.

Parity: ``/root/reference/nequip/nn/pair_potential.py`` — ZBL screening
constants from LAMMPS ``pair_zbl_const.h``, unit conversion prefactors from
LAMMPS ``update.cpp`` (metal: 14.399645 eV*A, real: 332.06371 kcal/mol*A),
half the pair energy on each directed edge.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import numpy as np
import jax.numpy as jnp

from ..data import _keys
from ..ops.irreps import Irreps
from ..ops.scatter import scatter_sum
from .embedding.edge import PolynomialCutoff
from .graph_utils import with_edge_vectors
from .module import GraphModule, Params

_QQR2E = {"metal": 14.399645, "real": 332.06371}


def _zbl_pair_energy(Zi, Zj, r, qqr2exesquare):
    """Screened-Coulomb pair energy (LAMMPS pair_zbl_const.h constants)."""
    pzbl, a0 = 0.23, 0.46850
    c1, c2, c3, c4 = 0.02817, 0.28022, 0.50986, 0.18175
    d1, d2, d3, d4 = -0.20162, -0.40290, -0.94229, -3.19980
    x = ((jnp.power(Zi, pzbl) + jnp.power(Zj, pzbl)) * r) / a0
    psi = (
        c1 * jnp.exp(d1 * x)
        + c2 * jnp.exp(d2 * x)
        + c3 * jnp.exp(d3 * x)
        + c4 * jnp.exp(d4 * x)
    )
    return qqr2exesquare * ((Zi * Zj) / r) * psi


class ZBL(GraphModule):
    def __init__(
        self,
        type_names: List[str],
        chemical_species: List[str],
        units: str,
        polynomial_cutoff_p: float = 6.0,
        per_atom_energy_field: str = _keys.PER_ATOM_ENERGY_KEY,
        irreps_in=None,
    ):
        super().__init__()
        from ..data.transforms.type_mapper import ATOMIC_NUMBERS

        assert len(chemical_species) == len(type_names)
        self.per_atom_energy_field = per_atom_energy_field
        self._init_irreps(
            irreps_in=irreps_in,
            required_irreps_in=[_keys.NORM_LENGTH_KEY],
            irreps_out={self.per_atom_energy_field: Irreps("1x0e")},
        )
        atomic_numbers = [ATOMIC_NUMBERS[s] for s in chemical_species]
        if min(atomic_numbers) < 1:
            raise ValueError("invalid chemical symbols for ZBL")
        self._Z = np.asarray(atomic_numbers, dtype=np.float64)
        # half the energy on each of the (i,j), (j,i) directed edges
        self._qqr2exesquare = _QQR2E[units] * 0.5
        self.cutoff = PolynomialCutoff(polynomial_cutoff_p)

    def __call__(self, params: Params, data: dict) -> dict:
        data = with_edge_vectors(data, with_lengths=True)
        ei = data[_keys.EDGE_INDEX_KEY]
        r = data[_keys.EDGE_LENGTH_KEY].reshape(-1)
        # guard padded zero-length edges (masked below via the cutoff)
        r_safe = jnp.where(r > 0, r, 1.0)
        types = data[_keys.ATOM_TYPE_KEY].reshape(-1)
        Z = jnp.asarray(self._Z, dtype=r.dtype)
        Zi = jnp.take(Z, jnp.take(types, ei[0]))
        Zj = jnp.take(Z, jnp.take(types, ei[1]))
        eng = _zbl_pair_energy(Zi, Zj, r_safe, self._qqr2exesquare)[:, None]
        cutoff = self.cutoff(data[_keys.NORM_LENGTH_KEY]).astype(self.model_dtype)
        mask = data.get(_keys.EDGE_MASK_KEY)
        if mask is not None:
            cutoff = jnp.where(mask[:, None], cutoff, 0.0)
        eng = eng.astype(self.model_dtype) * cutoff
        num_nodes = data[_keys.POSITIONS_KEY].shape[0]
        atomic_eng = scatter_sum(eng, ei[0], num_segments=num_nodes, mask=mask)
        data = dict(data)
        if self.per_atom_energy_field in data:
            atomic_eng = atomic_eng + data[self.per_atom_energy_field].astype(
                atomic_eng.dtype
            )
        data[self.per_atom_energy_field] = atomic_eng
        return data

    def __repr__(self):
        return f"ZBL(Z={self._Z.tolist()})"


class LennardJones(GraphModule):
    """Per-type-pair LJ with the polynomial envelope.

    Parity: ``LennardJones`` (``pair_potential.py:35-174``).
    """

    def __init__(
        self,
        type_names: List[str],
        lj_sigma: Union[float, Dict[str, float]],
        lj_epsilon: Union[float, Dict[str, float]],
        polynomial_cutoff_p: float = 6.0,
        per_atom_energy_field: str = _keys.PER_ATOM_ENERGY_KEY,
        irreps_in=None,
    ):
        super().__init__()
        self.type_names = list(type_names)
        n = len(type_names)
        self.per_atom_energy_field = per_atom_energy_field
        self._init_irreps(
            irreps_in=irreps_in,
            required_irreps_in=[_keys.NORM_LENGTH_KEY],
            irreps_out={self.per_atom_energy_field: Irreps("1x0e")},
        )

        def to_matrix(v):
            if isinstance(v, (int, float)):
                return np.full((n, n), float(v))
            mat = np.zeros((n, n))
            for key, val in v.items():
                names = key.split(",") if isinstance(key, str) and "," in key else None
                if names:
                    i, j = (self.type_names.index(x.strip()) for x in names)
                    mat[i, j] = mat[j, i] = float(val)
                else:
                    i = self.type_names.index(key)
                    mat[i, :] = mat[:, i] = float(val)
            return mat

        self._sigma = to_matrix(lj_sigma)
        self._epsilon = to_matrix(lj_epsilon)
        self.cutoff = PolynomialCutoff(polynomial_cutoff_p)

    def __call__(self, params: Params, data: dict) -> dict:
        data = with_edge_vectors(data, with_lengths=True)
        ei = data[_keys.EDGE_INDEX_KEY]
        r = data[_keys.EDGE_LENGTH_KEY].reshape(-1)
        r_safe = jnp.where(r > 0, r, 1.0)
        types = data[_keys.ATOM_TYPE_KEY].reshape(-1)
        ti = jnp.take(types, ei[0])
        tj = jnp.take(types, ei[1])
        sigma = jnp.asarray(self._sigma, dtype=r.dtype)[ti, tj]
        eps = jnp.asarray(self._epsilon, dtype=r.dtype)[ti, tj]
        s6 = jnp.power(sigma / r_safe, 6.0)
        eng = (2.0 * eps * (s6 * s6 - s6))[:, None]
        cutoff = self.cutoff(data[_keys.NORM_LENGTH_KEY]).astype(self.model_dtype)
        mask = data.get(_keys.EDGE_MASK_KEY)
        if mask is not None:
            cutoff = jnp.where(mask[:, None], cutoff, 0.0)
        eng = eng.astype(self.model_dtype) * cutoff
        num_nodes = data[_keys.POSITIONS_KEY].shape[0]
        atomic_eng = scatter_sum(eng, ei[0], num_segments=num_nodes, mask=mask)
        data = dict(data)
        if self.per_atom_energy_field in data:
            atomic_eng = atomic_eng + data[self.per_atom_energy_field].astype(
                atomic_eng.dtype
            )
        data[self.per_atom_energy_field] = atomic_eng
        return data
