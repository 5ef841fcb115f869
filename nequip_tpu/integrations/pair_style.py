"""MD-engine pair-style integration (LAMMPS-ML-IAP-equivalent).

Parity: ``NequIPLAMMPSMLIAPWrapper``
(``/root/reference/nequip/integrations/lammps_mliap/lmp_mliap_wrapper.py``)
and ``nequip-prepare-lmp-mliap``: the MD engine owns the spatial
decomposition and hands us per-rank edge vectors (``rij``), pair indices,
and local+ghost types; we return per-atom energies and **edge forces**
(dE/d r_ij), which the engine accumulates onto atoms and communicates.

TPU-native: the model runs the ``edge_vectors`` branch of ForceStressOutput
(``grad_output.py:276-298``-parity), jitted once per padded capacity bucket.
The wrapper file format is a self-contained package archive plus capacities.
"""

from __future__ import annotations

import json
import pickle
from typing import Dict, Optional

import numpy as np

from ..data import _keys, round_up


class NequIPPairStyleWrapper:
    """Callable pair-style kernel for external MD engines."""

    def __init__(self, model, params, pad_multiple: int = 128):
        import jax

        self.model = model
        self.params = params
        self.pad_multiple = pad_multiple
        self._fwd_cache = {}
        self.r_max = float(model.r_max)
        self.type_names = model.type_names

    def _fwd(self, n_nodes_cap: int, n_edges_cap: int):
        key = (n_nodes_cap, n_edges_cap)
        if key not in self._fwd_cache:
            import jax

            self._fwd_cache[key] = jax.jit(lambda d: self.model(self.params, d))
        return self._fwd_cache[key]

    def compute(
        self,
        rij: np.ndarray,  # (n_pairs, 3) edge vectors (center -> neighbor)
        pair_i: np.ndarray,  # (n_pairs,) center indices (local)
        pair_j: np.ndarray,  # (n_pairs,) neighbor indices (local+ghost)
        elems: np.ndarray,  # (n_total,) atom types for local+ghost atoms
        n_local: int,
    ) -> Dict[str, np.ndarray]:
        """Returns per-atom energies (local), total energy, edge forces."""
        import jax.numpy as jnp

        n_total = int(len(elems))
        n_pairs = int(len(pair_i))
        cap_n = round_up(max(n_total, 1), self.pad_multiple)
        cap_e = round_up(max(n_pairs, 1), 2 * self.pad_multiple)

        data = {
            _keys.EDGE_VECTORS_KEY: np.zeros((cap_e, 3)),
            _keys.EDGE_INDEX_KEY: np.full((2, cap_e), cap_n - 1, dtype=np.int32),
            _keys.ATOM_TYPE_KEY: np.zeros(cap_n, dtype=np.int32),
            _keys.POSITIONS_KEY: np.zeros((cap_n, 3)),  # unused by this branch
            _keys.BATCH_KEY: np.zeros(cap_n, dtype=np.int32),
            _keys.NUM_NODES_KEY: np.array([cap_n], dtype=np.int32),
            _keys.NODE_MASK_KEY: np.arange(cap_n) < n_total,
            _keys.EDGE_MASK_KEY: np.arange(cap_e) < n_pairs,
            _keys.FRAME_MASK_KEY: np.ones(1, dtype=bool),
            _keys.NUM_LOCAL_GHOST_NODES_KEY: np.array(
                [n_local, n_total - n_local], dtype=np.int32
            ),
        }
        data[_keys.EDGE_VECTORS_KEY][:n_pairs] = rij
        data[_keys.EDGE_INDEX_KEY][0, :n_pairs] = pair_i
        data[_keys.EDGE_INDEX_KEY][1, :n_pairs] = pair_j
        data[_keys.ATOM_TYPE_KEY][:n_total] = elems

        out = self._fwd(cap_n, cap_e)({k: jnp.asarray(v) for k, v in data.items()})
        e_atom = np.asarray(out[_keys.PER_ATOM_ENERGY_KEY])[:n_local].reshape(-1)
        edge_forces = np.asarray(out[_keys.EDGE_FORCE_KEY])[:n_pairs]
        return {
            "atomic_energies": e_atom,
            "total_energy": float(e_atom.sum()),
            "edge_forces": edge_forces,
        }

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        import jax

        payload = {
            "format": "nequip_tpu_pair_style_v1",
            "model_config": getattr(self.model, "model_config", {}),
            "params": jax.tree.map(lambda x: np.asarray(x), self.params),
            "metadata": {k: str(v) for k, v in self.model.metadata.items()},
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    @classmethod
    def load(cls, path: str) -> "NequIPPairStyleWrapper":
        import jax.numpy as jnp
        import jax

        from ..utils.config import instantiate

        with open(path, "rb") as f:
            payload = pickle.load(f)
        assert payload.get("format") == "nequip_tpu_pair_style_v1"
        model = instantiate(payload["model_config"], _recursive_=False)
        params = jax.tree.map(jnp.asarray, payload["params"])
        return cls(model, params)
