"""Dataset statistics manager: single-pass streaming stats over a dataloader.

Parity: ``DataStatisticsManager`` / ``CommonDataStatisticsManager`` /
``EnergyOnlyDataStatisticsManager``
(``/root/reference/nequip/data/stats_manager.py``).  Names produced here feed
the ``${training_data_stats:<name>}`` config resolver.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

import numpy as np

from . import _keys
from .modifier import BaseModifier, NumNeighbors, PerAtomModifier
from .stats import STAT_CLASSES, _Accumulator


class DataStatisticsManager:
    """``metrics``: list of dicts with keys

    * ``name`` — statistic name for resolver lookup,
    * ``field`` — a str field name or a modifier instance/config,
    * ``metric`` — one of ``mean|rms|std|max|min|count`` (or an accumulator),
    * ``per_type`` (optional) — compute per atom type (node fields only).
    """

    def __init__(
        self,
        metrics: List[Dict[str, Any]],
        dataloader_kwargs: Optional[dict] = None,
        type_names: Optional[List[str]] = None,
    ):
        self.type_names = list(type_names) if type_names else None
        self.dataloader_kwargs = dict(dataloader_kwargs or {})
        self.specs = []
        for m in metrics:
            field = m["field"]
            if isinstance(field, str):
                field = BaseModifier(field)
            elif isinstance(field, dict) and "_target_" in field:
                from ..utils.config import instantiate

                field = instantiate(field)
            metric = m["metric"]
            if isinstance(metric, str):
                metric = metric.lower()
                assert metric in STAT_CLASSES, f"unknown statistic {metric!r}"
            self.specs.append(
                {
                    "name": m.get("name")
                    or f"{field.name}_{metric if isinstance(metric, str) else type(metric).__name__.lower()}",
                    "field": field,
                    "metric": metric,
                    "per_type": bool(m.get("per_type", False)),
                }
            )

    def _new_acc(self, metric) -> _Accumulator:
        if isinstance(metric, str):
            return STAT_CLASSES[metric]()
        return type(metric)()

    def get_statistics(self, dataloader) -> Dict[str, Union[float, Dict[str, float]]]:
        accs: Dict[str, Any] = {}
        for spec in self.specs:
            if spec["per_type"]:
                assert self.type_names is not None, (
                    f"per_type statistic {spec['name']} requires type_names"
                )
                accs[spec["name"]] = {
                    t: self._new_acc(spec["metric"]) for t in self.type_names
                }
            else:
                accs[spec["name"]] = self._new_acc(spec["metric"])

        batches = (
            dataloader.host_batches()
            if hasattr(dataloader, "host_batches")
            else iter(dataloader)
        )
        for batch in batches:
            for spec in self.specs:
                values = np.asarray(spec["field"](batch), dtype=np.float64)
                if spec["per_type"]:
                    types = np.asarray(batch[_keys.ATOM_TYPE_KEY]).reshape(-1)
                    assert values.shape[0] == types.shape[0], (
                        f"per_type statistic {spec['name']} needs a node field"
                    )
                    for ti, tname in enumerate(self.type_names):
                        sel = values[types == ti]
                        if sel.size:
                            accs[spec["name"]][tname].update(sel)
                else:
                    accs[spec["name"]].update(values)

        out: Dict[str, Union[float, Dict[str, float]]] = {}
        for spec in self.specs:
            if spec["per_type"]:
                out[spec["name"]] = {
                    t: a.compute() for t, a in accs[spec["name"]].items()
                }
            else:
                out[spec["name"]] = accs[spec["name"]].compute()
        return out


def CommonDataStatisticsManager(
    dataloader_kwargs: Optional[dict] = None,
    type_names: Optional[List[str]] = None,
) -> DataStatisticsManager:
    """num_neighbors_mean, per_type_num_neighbors_mean, per_atom_energy_mean,
    forces_rms, per_type_forces_rms (parity: ``stats_manager.py:229-287``)."""
    metrics = [
        {"name": "num_neighbors_mean", "field": NumNeighbors(), "metric": "mean"},
        {
            "name": "per_type_num_neighbors_mean",
            "field": NumNeighbors(),
            "metric": "mean",
            "per_type": True,
        },
        {
            "name": "per_atom_energy_mean",
            "field": PerAtomModifier(_keys.TOTAL_ENERGY_KEY),
            "metric": "mean",
        },
        {"name": "forces_rms", "field": _keys.FORCE_KEY, "metric": "rms"},
        {
            "name": "per_type_forces_rms",
            "field": _keys.FORCE_KEY,
            "metric": "rms",
            "per_type": True,
        },
    ]
    return DataStatisticsManager(metrics, dataloader_kwargs, type_names)


def EnergyOnlyDataStatisticsManager(
    dataloader_kwargs: Optional[dict] = None,
    type_names: Optional[List[str]] = None,
) -> DataStatisticsManager:
    metrics = [
        {"name": "num_neighbors_mean", "field": NumNeighbors(), "metric": "mean"},
        {
            "name": "per_atom_energy_mean",
            "field": PerAtomModifier(_keys.TOTAL_ENERGY_KEY),
            "metric": "mean",
        },
        {
            "name": "per_atom_energy_std",
            "field": PerAtomModifier(_keys.TOTAL_ENERGY_KEY),
            "metric": "std",
        },
        {"name": "total_energy_std", "field": _keys.TOTAL_ENERGY_KEY, "metric": "std"},
    ]
    return DataStatisticsManager(metrics, dataloader_kwargs, type_names)
