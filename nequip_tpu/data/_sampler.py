"""PartialSampler: deterministic partial epochs over large datasets.

Parity: ``/root/reference/nequip/data/_sampler.py:8-105`` — iterate a fixed
number of frames per "epoch" while advancing deterministically through a
full shuffle of the dataset across epochs (foundation-model data path).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class PartialSampler:
    def __init__(
        self,
        data_source_len: int,
        num_samples_per_epoch: Optional[int] = None,
        shuffle: bool = True,
        seed: int = 0,
    ):
        self.n = int(data_source_len)
        self.num_samples = (
            int(num_samples_per_epoch) if num_samples_per_epoch else self.n
        )
        assert self.num_samples <= self.n
        self.shuffle = shuffle
        self.seed = int(seed)
        self._epoch = 0  # full-shuffle cycles are keyed by this

    def step_epoch(self) -> None:
        self._epoch += 1

    def state_dict(self) -> dict:
        return {"epoch": self._epoch}

    def load_state_dict(self, sd: dict) -> None:
        self._epoch = int(sd["epoch"])

    def __len__(self) -> int:
        return self.num_samples

    def __iter__(self):
        start = (self._epoch * self.num_samples) % self.n
        cycle = (self._epoch * self.num_samples) // self.n
        if self.shuffle:
            order = np.random.RandomState(self.seed + cycle).permutation(self.n)
        else:
            order = np.arange(self.n)
        # wrap into the next cycle's shuffle if the window crosses the end
        idx = []
        pos = start
        c = cycle
        for _ in range(self.num_samples):
            if pos >= self.n:
                pos = 0
                c += 1
                order = (
                    np.random.RandomState(self.seed + c).permutation(self.n)
                    if self.shuffle
                    else np.arange(self.n)
                )
            idx.append(int(order[pos]))
            pos += 1
        return iter(idx)
