"""Per-frame dataset-index tag transform.

Parity: ``/root/reference/nequip/data/transforms/dataset.py:7-19``.
"""

from __future__ import annotations

import numpy as np

from .. import _keys


class DatasetIndexTransform:
    def __init__(self, dataset_index: int):
        self.dataset_index = int(dataset_index)

    def __call__(self, data: dict) -> dict:
        data[_keys.DATASET_KEY] = np.array([[self.dataset_index]], dtype=np.int32)
        return data
