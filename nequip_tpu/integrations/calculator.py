"""Framework-native calculator: single-point energies/forces/stress.

Parity: ``NequIPCalculator`` (``/root/reference/nequip/integrations/ase.py``)
without requiring ASE: it consumes plain frame dicts (positions, atomic
numbers / types, cell, pbc), runs the host-side transform pipeline
(type mapping -> neighborlist -> padding to the artifact's static
capacities) and the compiled/jitted model, and returns physical outputs with
padding stripped.  ``nequip_tpu.integrations.ase_adapter`` wraps this in the
ASE ``Calculator`` interface when ASE is installed.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..data import _keys, batched_from_list, compute_neighborlist_, from_dict, pad_batch, round_up
from ..data.transforms.type_mapper import ChemicalSpeciesToAtomTypeMapper


class NequIPCalculator:
    def __init__(
        self,
        predictor,  # callable(padded dict) -> outputs dict
        r_max: float,
        type_names: List[str],
        chemical_symbols: Optional[List[str]] = None,
        capacities: Optional[Dict[str, int]] = None,
        pad_multiple: int = 128,
    ):
        self.predictor = predictor
        self.r_max = float(r_max)
        self.type_names = list(type_names)
        self.type_mapper = (
            ChemicalSpeciesToAtomTypeMapper(chemical_symbols or self.type_names)
        )
        self.capacities = dict(capacities) if capacities else None
        self.pad_multiple = pad_multiple

    # ------------------------------------------------------------------
    @classmethod
    def from_compiled_model(cls, path: str, chemical_symbols=None) -> "NequIPCalculator":
        from ..model.inference_models import load_compiled_model

        compiled = load_compiled_model(path)
        md = compiled.metadata
        return cls(
            predictor=compiled,
            r_max=float(md["r_max"]),
            type_names=md["type_names"].split(),
            chemical_symbols=chemical_symbols,
            capacities=compiled.capacities,
        )

    @classmethod
    def from_saved_model(cls, path: str, chemical_symbols=None, capacities=None) -> "NequIPCalculator":
        """Load a checkpoint or package and jit the eager model."""
        import jax

        from ..model.saved_models import load_saved_model

        model, params = load_saved_model(path)
        fwd = jax.jit(lambda d: model(params, d))
        md = model.metadata
        return cls(
            predictor=lambda d: fwd(d),
            r_max=float(md["r_max"]),
            type_names=md["type_names"].split(),
            chemical_symbols=chemical_symbols,
            capacities=capacities,
        )

    # ------------------------------------------------------------------
    def _prepare(self, frame: dict) -> dict:
        data = from_dict(dict(frame))
        data = self.type_mapper(data)
        data = compute_neighborlist_(data, self.r_max)
        batch = batched_from_list([data])
        n = batch[_keys.POSITIONS_KEY].shape[0]
        e = batch[_keys.EDGE_INDEX_KEY].shape[1]
        if hasattr(self.predictor, "select_capacities"):
            # capacity-ladder artifact: pad to the smallest rung that fits,
            # so a growing system (NPT, deposition) walks up the ladder
            # without a re-export (the static-shape answer to the
            # reference's dynamic-dim bounds, compile.py:266-270)
            cap = self.predictor.select_capacities(n, e)
            if cap is None:
                raise ValueError(
                    f"system ({n} atoms, {e} edges) exceeds the compiled "
                    f"artifact's largest capacity rung "
                    f"{self.predictor.capacities}; re-compile with larger "
                    f"--num-nodes/--num-edges or more --capacity-ladder rungs"
                )
        else:
            if self.capacities is None:
                # bucketed capacities: few recompiles, amortized across calls
                self.capacities = {
                    "n_nodes": round_up(n, self.pad_multiple),
                    "n_edges": round_up(max(e, 1), 2 * self.pad_multiple),
                    "n_frames": 2,
                }
            cap = self.capacities
            if n > cap["n_nodes"] or e > cap["n_edges"]:
                if hasattr(self.predictor, "capacities"):
                    raise ValueError(
                        f"system ({n} atoms, {e} edges) exceeds the compiled "
                        f"artifact capacities {cap}; re-compile with larger "
                        f"--num-nodes/--num-edges"
                    )
                # eager predictor: grow buckets
                cap = self.capacities = {
                    "n_nodes": round_up(n, self.pad_multiple),
                    "n_edges": round_up(e, 2 * self.pad_multiple),
                    "n_frames": 2,
                }
        return pad_batch(batch, cap["n_nodes"], cap["n_edges"], cap["n_frames"]), n

    def calculate(self, frame: dict) -> Dict[str, np.ndarray]:
        """frame: {pos, atomic_numbers|atom_types, cell?, pbc?} -> results."""
        padded, n = self._prepare(frame)
        out = self.predictor(padded)
        results = {
            "energy": float(np.asarray(out[_keys.TOTAL_ENERGY_KEY]).reshape(-1)[0]),
            "energies": np.asarray(out[_keys.PER_ATOM_ENERGY_KEY])[:n].reshape(-1),
            "free_energy": float(np.asarray(out[_keys.TOTAL_ENERGY_KEY]).reshape(-1)[0]),
        }
        if _keys.FORCE_KEY in out:
            results["forces"] = np.asarray(out[_keys.FORCE_KEY])[:n]
        if _keys.STRESS_KEY in out and _keys.CELL_KEY in frame:
            s = np.asarray(out[_keys.STRESS_KEY])[0]
            results["stress"] = s
            # voigt order (xx, yy, zz, yz, xz, xy) for ASE compatibility
            results["stress_voigt"] = np.array(
                [s[0, 0], s[1, 1], s[2, 2], s[1, 2], s[0, 2], s[0, 1]]
            )
        return results
