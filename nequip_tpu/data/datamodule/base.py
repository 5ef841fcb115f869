"""Datamodule: datasets + splits + loaders + statistics.

Parity: ``NequIPDataModule``
(``/root/reference/nequip/data/datamodule/_base_datamodule.py``): train/val/
test/predict dataset (lists), ``split_dataset`` fractions, per-split
dataloader kwargs, ``get_statistics``, restartable state.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from ..dataset.base import AtomicDataset, RandomSplitDataset
from ..loader import DataLoader
from ..stats_manager import DataStatisticsManager


def _build_dataset(cfg) -> AtomicDataset:
    if isinstance(cfg, AtomicDataset):
        return cfg
    from ...utils.config import instantiate

    return instantiate(cfg)


class NequIPDataModule:
    def __init__(
        self,
        seed: int = 0,
        train_dataset=None,
        val_dataset=None,
        test_dataset=None,
        predict_dataset=None,
        split_dataset: Optional[Union[dict, List[dict]]] = None,
        train_dataloader: Optional[dict] = None,
        val_dataloader: Optional[dict] = None,
        test_dataloader: Optional[dict] = None,
        predict_dataloader: Optional[dict] = None,
        stats_manager: Optional[Union[dict, DataStatisticsManager]] = None,
    ):
        self.seed = int(seed)
        self._configs = {
            "train": train_dataset,
            "val": val_dataset,
            "test": test_dataset,
            "predict": predict_dataset,
        }
        self._split_config = split_dataset
        self._loader_kwargs = {
            "train": dict(train_dataloader or {}),
            "val": dict(val_dataloader or {}),
            "test": dict(test_dataloader or {}),
            "predict": dict(predict_dataloader or {}),
        }
        if isinstance(stats_manager, dict):
            from ...utils.config import instantiate

            stats_manager = instantiate(stats_manager)
        self.stats_manager = stats_manager
        self.datasets: Dict[str, List[AtomicDataset]] = {}
        self._loaders: Dict[str, List[DataLoader]] = {}
        self._setup_done = False

    # ------------------------------------------------------------------
    def setup(self, stage: Optional[str] = None) -> None:
        if self._setup_done:
            return
        datasets: Dict[str, List[AtomicDataset]] = {
            "train": [],
            "val": [],
            "test": [],
            "predict": [],
        }
        for split, cfg in self._configs.items():
            if cfg is None:
                continue
            cfgs = cfg if isinstance(cfg, (list, tuple)) else [cfg]
            datasets[split].extend(_build_dataset(c) for c in cfgs)

        if self._split_config is not None:
            split_cfgs = (
                self._split_config
                if isinstance(self._split_config, (list, tuple))
                else [self._split_config]
            )
            for sc in split_cfgs:
                sc = dict(sc)
                base = _build_dataset(sc.pop("dataset"))
                seed = int(sc.pop("seed", self.seed))
                parts = RandomSplitDataset(base, sc, seed=seed)
                for name, sub in parts.items():
                    datasets[name].append(sub)

        assert (
            sum(len(v) for v in datasets.values()) > 0
        ), "datamodule has no datasets configured"
        self.datasets = datasets
        self._setup_done = True

    # ------------------------------------------------------------------
    def _make_loaders(self, split: str) -> List[DataLoader]:
        if split not in self._loaders:
            kwargs = dict(self._loader_kwargs[split])
            kwargs.setdefault("batch_size", 1)
            if split == "train":
                kwargs.setdefault("shuffle", True)
            kwargs.setdefault("seed", self.seed)
            self._loaders[split] = [
                DataLoader(ds, **kwargs) for ds in self.datasets.get(split, [])
            ]
        return self._loaders[split]

    def train_dataloader(self) -> DataLoader:
        loaders = self._make_loaders("train")
        assert len(loaders) == 1, "exactly one train dataset is supported"
        return loaders[0]

    def val_dataloaders(self) -> List[DataLoader]:
        return self._make_loaders("val")

    def test_dataloaders(self) -> List[DataLoader]:
        return self._make_loaders("test")

    def predict_dataloaders(self) -> List[DataLoader]:
        return self._make_loaders("predict")

    # ------------------------------------------------------------------
    def get_statistics(self, dataset: str = "train"):
        """Compute dataset statistics with the configured stats manager.

        Parity: ``_base_datamodule.py:341-376``.
        """
        assert self.stats_manager is not None, "no stats_manager configured"
        self.setup("fit")
        ds_list = self.datasets[dataset]
        assert len(ds_list) >= 1
        kwargs = dict(self.stats_manager.dataloader_kwargs)
        kwargs.setdefault("batch_size", 8)
        loader = DataLoader(ds_list[0], **kwargs)
        return self.stats_manager.get_statistics(loader)

    # ------------------------------------------------------------------
    def state_dict(self) -> dict:
        return {
            "loaders": {
                split: [ld.state_dict() for ld in lds]
                for split, lds in self._loaders.items()
            }
        }

    def load_state_dict(self, sd: dict) -> None:
        for split, states in sd.get("loaders", {}).items():
            for ld, s in zip(self._make_loaders(split), states):
                ld.load_state_dict(s)
