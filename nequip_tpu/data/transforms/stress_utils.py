"""Stress/virial label transforms.

Parity: ``/root/reference/nequip/data/transforms/stress_utils.py:6-66``.
"""

from __future__ import annotations

import numpy as np

from .. import _keys


class VirialToStressTransform:
    """stress = -virial / volume (sign convention: virial = -stress * V)."""

    def __call__(self, data: dict) -> dict:
        assert _keys.VIRIAL_KEY in data and _keys.CELL_KEY in data
        cell = np.asarray(data[_keys.CELL_KEY]).reshape(-1, 3, 3)
        vol = np.abs(np.linalg.det(cell)).reshape(-1, 1, 1)
        virial = np.asarray(data[_keys.VIRIAL_KEY]).reshape(-1, 3, 3)
        data[_keys.STRESS_KEY] = -virial / vol
        return data


class StressSignFlipTransform:
    """Flip the sign of stress labels (for datasets with the opposite convention)."""

    def __call__(self, data: dict) -> dict:
        data[_keys.STRESS_KEY] = -np.asarray(data[_keys.STRESS_KEY])
        return data


class AddNaNStressTransform:
    """Pad missing stress labels with NaN (handled via ignore_nan in losses)."""

    def __call__(self, data: dict) -> dict:
        if _keys.STRESS_KEY not in data:
            data[_keys.STRESS_KEY] = np.full((1, 3, 3), np.nan)
        return data
