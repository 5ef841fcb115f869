"""ase.Atoms <-> AtomicDataDict converters (optional host dependency).

Parity: ``/root/reference/nequip/data/ase.py`` (``from_ase`` :19-169,
``to_ase`` :172-324): reads positions/cell/pbc plus calculator results
(energy, energies, forces, stress in voigt or 3x3) and per-atom/per-frame
arrays with key mapping; writes frames back to ``ase.Atoms`` with a
SinglePointCalculator carrying predictions.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from . import _keys

_DEFAULT_KEY_MAPPING = {
    "energy": _keys.TOTAL_ENERGY_KEY,
    "free_energy": _keys.FREE_ENERGY_KEY,
    "energies": _keys.PER_ATOM_ENERGY_KEY,
    "forces": _keys.FORCE_KEY,
    "force": _keys.FORCE_KEY,
    "stress": _keys.STRESS_KEY,
    "virial": _keys.VIRIAL_KEY,
    "charges": _keys.CHARGE_KEY,
    "magmoms": _keys.MAGMOM_KEY,
    "dipole": _keys.DIPOLE_KEY,
}


def _voigt_to_full(v: np.ndarray) -> np.ndarray:
    xx, yy, zz, yz, xz, xy = v.reshape(-1)
    return np.array([[xx, xy, xz], [xy, yy, yz], [xz, yz, zz]])


def from_ase(
    atoms,
    key_mapping: Optional[Dict[str, str]] = None,
    include_keys: Optional[Sequence[str]] = None,
) -> dict:
    """Convert ``ase.Atoms`` (+ attached calculator results) to a raw frame."""
    mapping = dict(_DEFAULT_KEY_MAPPING)
    mapping.update(key_mapping or {})

    frame = {
        _keys.POSITIONS_KEY: atoms.get_positions(),
        _keys.ATOMIC_NUMBERS_KEY: atoms.get_atomic_numbers(),
    }
    if atoms.pbc.any():
        frame[_keys.CELL_KEY] = np.asarray(atoms.get_cell())
        frame[_keys.PBC_KEY] = np.asarray(atoms.pbc)

    sources = {}
    if getattr(atoms, "calc", None) is not None and getattr(
        atoms.calc, "results", None
    ):
        sources.update(atoms.calc.results)
    sources.update(atoms.info)
    sources.update({k: v for k, v in atoms.arrays.items() if k not in ("positions", "numbers")})

    for raw_key, value in sources.items():
        if include_keys is not None and raw_key not in include_keys and raw_key not in mapping:
            continue
        key = mapping.get(raw_key)
        if key is None:
            continue
        value = np.asarray(value)
        if key in (_keys.STRESS_KEY, _keys.VIRIAL_KEY) and value.size == 6:
            value = _voigt_to_full(value)
        frame[key] = value
    return frame


def to_ase(frame: dict, chemical_symbols: Optional[List[str]] = None):
    """Convert a (single, unpadded) frame dict back to ``ase.Atoms``."""
    import ase
    from ase.calculators.singlepoint import SinglePointCalculator

    z = frame.get(_keys.ATOMIC_NUMBERS_KEY)
    if z is None and chemical_symbols is not None:
        from .transforms.type_mapper import ATOMIC_NUMBERS

        types = np.asarray(frame[_keys.ATOM_TYPE_KEY]).reshape(-1)
        z = np.asarray([ATOMIC_NUMBERS[chemical_symbols[t]] for t in types])
    kwargs = dict(numbers=np.asarray(z).reshape(-1), positions=np.asarray(frame[_keys.POSITIONS_KEY]))
    if _keys.CELL_KEY in frame:
        kwargs["cell"] = np.asarray(frame[_keys.CELL_KEY]).reshape(3, 3)
        kwargs["pbc"] = np.asarray(frame.get(_keys.PBC_KEY, np.ones(3, bool))).reshape(-1)
    atoms = ase.Atoms(**kwargs)

    results = {}
    if _keys.TOTAL_ENERGY_KEY in frame:
        results["energy"] = float(np.asarray(frame[_keys.TOTAL_ENERGY_KEY]).reshape(-1)[0])
    if _keys.PER_ATOM_ENERGY_KEY in frame:
        results["energies"] = np.asarray(frame[_keys.PER_ATOM_ENERGY_KEY]).reshape(-1)
    if _keys.FORCE_KEY in frame:
        results["forces"] = np.asarray(frame[_keys.FORCE_KEY])
    if _keys.STRESS_KEY in frame:
        s = np.asarray(frame[_keys.STRESS_KEY]).reshape(3, 3)
        results["stress"] = np.array(
            [s[0, 0], s[1, 1], s[2, 2], s[1, 2], s[0, 2], s[0, 1]]
        )
    if results:
        atoms.calc = SinglePointCalculator(atoms, **results)
    return atoms
