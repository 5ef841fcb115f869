"""ASE Calculator adapter (optional dependency).

Parity: ``NequIPCalculator`` as an ``ase.calculators.calculator.Calculator``
(``/root/reference/nequip/integrations/ase.py:13-160``).  Import requires
the host-side ``ase`` package.
"""

from __future__ import annotations

import numpy as np

from ..data import _keys
from .calculator import NequIPCalculator


def _require_ase():
    try:
        from ase.calculators.calculator import Calculator, all_changes

        return Calculator, all_changes
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "the ASE adapter requires the optional `ase` package"
        ) from e


def from_ase_atoms(atoms) -> dict:
    """ase.Atoms -> raw frame dict (full converter in data.ase_adapter)."""
    from ..data.ase_adapter import from_ase

    frame = from_ase(atoms)
    # the calculator provides the geometry only; drop any label fields
    for k in (_keys.TOTAL_ENERGY_KEY, _keys.FORCE_KEY, _keys.STRESS_KEY,
              _keys.PER_ATOM_ENERGY_KEY, _keys.FREE_ENERGY_KEY, _keys.VIRIAL_KEY):
        frame.pop(k, None)
    return frame


def make_ase_calculator(inner: NequIPCalculator):
    Calculator, all_changes = _require_ase()

    class NequIPASECalculator(Calculator):
        implemented_properties = [
            "energy",
            "energies",
            "forces",
            "free_energy",
            "stress",
        ]

        def __init__(self, **kwargs):
            super().__init__(**kwargs)
            self.inner = inner

        def calculate(self, atoms=None, properties=["energy"], system_changes=all_changes):
            super().calculate(atoms, properties, system_changes)
            results = self.inner.calculate(from_ase_atoms(atoms))
            self.results = {
                "energy": results["energy"],
                "free_energy": results["free_energy"],
                "energies": results["energies"],
            }
            if "forces" in results:
                self.results["forces"] = results["forces"]
            if "stress_voigt" in results:
                self.results["stress"] = results["stress_voigt"]

    return NequIPASECalculator()
