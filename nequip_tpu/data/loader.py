"""Batched, padded data loading for static-shape jit.

Replaces the reference's torch DataLoader + dynamic-shape compile caching
(``/root/reference/nequip/data/datamodule/_base_datamodule.py``,
``nn/compile.py:91-236``): batches are padded to fixed capacities so the
training step compiles exactly once per bucket.  Capacities are chosen from a
one-time scan of the dataset (max nodes/edges per frame) and rounded up to a
configurable multiple to keep the number of distinct jit signatures tiny.

Deterministic + restartable: shuffling is keyed by (seed, epoch), and the
loader exposes ``state_dict``/``load_state_dict`` like the reference's
restartable dataloader state (``_base_datamodule.py:159-200``).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Sequence, Tuple

import numpy as np

from . import _keys
from .atomic_data_dict import batched_from_list, pad_batch, round_up, to_device


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        capacity: Optional[Dict[str, int]] = None,
        pad_multiple: int = 64,
        drop_last: bool = False,
        device: bool = True,
        dtype=None,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = int(seed)
        self.drop_last = drop_last
        self.pad_multiple = int(pad_multiple)
        self.device = device
        self.dtype = dtype
        self._epoch = 0
        self._capacity = capacity

    # --- capacity ------------------------------------------------------
    def _scan_capacity(self) -> Dict[str, int]:
        max_nodes = 0
        max_edges = 0
        for i in range(len(self.dataset)):
            frame = self.dataset[i]
            max_nodes = max(max_nodes, frame[_keys.POSITIONS_KEY].shape[0])
            if _keys.EDGE_INDEX_KEY in frame:
                max_edges = max(max_edges, frame[_keys.EDGE_INDEX_KEY].shape[1])
        return {
            "n_nodes": round_up(max_nodes * self.batch_size + 1, self.pad_multiple),
            "n_edges": round_up(max(max_edges * self.batch_size, 1), self.pad_multiple),
            "n_frames": self.batch_size + 1,
        }

    @property
    def capacity(self) -> Dict[str, int]:
        if self._capacity is None:
            self._capacity = self._scan_capacity()
        return self._capacity

    # --- iteration -----------------------------------------------------
    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            return np.random.RandomState(self.seed + self._epoch).permutation(n)
        return np.arange(n)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def host_batches(self) -> Iterator[dict]:
        """Unpadded numpy batches (for statistics computation)."""
        order = self._order()
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                break
            yield batched_from_list([self.dataset[i] for i in idx])

    def __iter__(self) -> Iterator[dict]:
        cap = self.capacity
        for batch in self.host_batches():
            padded = pad_batch(
                batch, cap["n_nodes"], cap["n_edges"], cap["n_frames"]
            )
            yield to_device(padded, dtype=self.dtype) if self.device else padded
        self._epoch += 1

    # --- restartable state --------------------------------------------
    def state_dict(self) -> dict:
        return {"epoch": self._epoch}

    def load_state_dict(self, state: dict) -> None:
        self._epoch = int(state["epoch"])
