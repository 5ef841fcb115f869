"""Unified loss + metrics engine (functional, jit-compatible).

Parity: ``MetricsManager`` (``/root/reference/nequip/train/metrics_manager.py:40-448``)
and its wrappers ``EnergyForce(Stress)Loss/Metrics``:

* entries = {name, field (str or modifier), metric (mse|mae|rmse|maxabserr),
  coeff, per_type, per_type_coeffs, ignore_nan};
* coefficients are normalized to sum to 1 (``set_coeffs`` semantics);
* per-batch values are exact masked means (padding/node/edge/frame masks and
  optional NaN-target masking);
* epoch accumulation keeps (sum, count, max) running state — batch-size
  invariant like the reference's Welford metrics, and distributable with a
  single ``psum`` over the state (replacing torchmetrics dist_sync).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..data import _keys
from ..data._key_registry import get_field_type
from ..data.modifier import BaseModifier, PerAtomModifier

_METRIC_KINDS = ("mse", "mae", "rmse", "maxabserr")


def _field_mask(data: dict, ftype: str):
    if ftype == "node":
        return data.get(_keys.NODE_MASK_KEY)
    if ftype == "edge":
        return data.get(_keys.EDGE_MASK_KEY)
    if ftype == "graph":
        return data.get(_keys.FRAME_MASK_KEY)
    return None


def _as_modifier(field) -> BaseModifier:
    if isinstance(field, BaseModifier):
        return field
    if isinstance(field, str):
        return BaseModifier(field)
    if isinstance(field, dict) and "_target_" in field:
        from ..utils.config import instantiate

        return instantiate(field)
    raise TypeError(f"cannot interpret metric field {field!r}")


class MetricsManager:
    def __init__(
        self,
        metrics: List[Dict[str, Any]],
        type_names: Optional[Sequence[str]] = None,
    ):
        self.type_names = list(type_names) if type_names else None
        self.entries = []
        for m in metrics:
            mod = _as_modifier(m["field"])
            metric = m.get("metric", "mse")
            if not isinstance(metric, str):
                metric = type(metric).__name__
            metric = {
                "meansquarederror": "mse",
                "meanabsoluteerror": "mae",
                "rootmeansquarederror": "rmse",
                "maxabsolueerror": "maxabserr",
                "maxabserror": "maxabserr",
            }.get(metric.lower(), metric.lower())
            assert metric in _METRIC_KINDS, f"unknown metric {metric!r}"
            name = m.get("name") or f"{mod.name}_{metric}"
            per_type = bool(m.get("per_type", False))
            per_type_coeffs = m.get("per_type_coeffs")
            if per_type or per_type_coeffs:
                assert self.type_names, "per_type metrics require type_names"
            entry = {
                "name": name,
                "mod": mod,
                "metric": metric,
                "coeff": m.get("coeff", None),
                "per_type": per_type or per_type_coeffs is not None,
                "per_type_coeffs": per_type_coeffs,
                "ignore_nan": bool(m.get("ignore_nan", False)),
                "ftype": mod.field_type,
            }
            self.entries.append(entry)
        names = [e["name"] for e in self.entries]
        assert len(set(names)) == len(names), f"duplicate metric names: {names}"
        self.set_coeffs({e["name"]: e["coeff"] for e in self.entries})

    # ------------------------------------------------------------------
    def set_coeffs(self, coeffs: Dict[str, Optional[float]]) -> None:
        """Normalize the (non-None) coefficients to sum to 1."""
        total = sum(c for c in coeffs.values() if c is not None)
        self.coeffs: Dict[str, Optional[float]] = {}
        for e in self.entries:
            c = coeffs.get(e["name"], e["coeff"])
            self.coeffs[e["name"]] = (
                None if c is None else (float(c) / total if total else 0.0)
            )

    @property
    def names(self) -> List[str]:
        return [e["name"] for e in self.entries]

    # ------------------------------------------------------------------
    def _errors(self, entry, output: dict, target_data: dict):
        """(err, mask, types) with err = pred - target, mask f-dtype {0,1}."""
        pred = entry["mod"](output)
        target = entry["mod"](target_data)
        err = pred - target.astype(pred.dtype)
        mask = _field_mask(target_data, entry["ftype"])
        if mask is not None:
            m = mask.reshape((-1,) + (1,) * (err.ndim - 1))
        else:
            m = jnp.ones((err.shape[0],) + (1,) * (err.ndim - 1), dtype=bool)
        if entry["ignore_nan"]:
            m = m & jnp.isfinite(target)
        err = jnp.where(m, err, 0.0)
        return err, m.astype(err.dtype)

    def _batch_sums(self, entry, output: dict, target_data: dict):
        """Per-entry accumulators: dict of scalars (or per-type vectors)."""
        err, m = self._errors(entry, output, target_data)
        mfull = jnp.broadcast_to(m, err.shape)
        if entry["per_type"]:
            n_types = len(self.type_names)
            types = target_data[_keys.ATOM_TYPE_KEY].reshape(-1)
            flat_err = err.reshape(err.shape[0], -1)
            flat_m = mfull.reshape(err.shape[0], -1)
            abs_sum = jax.ops.segment_sum(
                jnp.sum(jnp.abs(flat_err), axis=1), types, num_segments=n_types
            )
            sq_sum = jax.ops.segment_sum(
                jnp.sum(flat_err**2, axis=1), types, num_segments=n_types
            )
            count = jax.ops.segment_sum(
                jnp.sum(flat_m, axis=1), types, num_segments=n_types
            )
            mx = jax.ops.segment_max(
                jnp.max(jnp.abs(flat_err), axis=1), types, num_segments=n_types
            )
            # "max" is metric-only (never in the loss); stop_gradient keeps the
            # non-differentiable pmax out of the backward pass under DP
            return {
                "abs": abs_sum,
                "sq": sq_sum,
                "count": count,
                "max": jax.lax.stop_gradient(mx),
            }
        return {
            "abs": jnp.sum(jnp.abs(err)),
            "sq": jnp.sum(err**2),
            "count": jnp.sum(mfull),
            "max": jax.lax.stop_gradient(jnp.max(jnp.abs(err))),
        }

    @staticmethod
    def _value_from_sums(metric: str, sums) -> jnp.ndarray:
        count = jnp.maximum(sums["count"], 1.0)
        if metric == "mae":
            return sums["abs"] / count
        if metric == "mse":
            return sums["sq"] / count
        if metric == "rmse":
            return jnp.sqrt(sums["sq"] / count)
        if metric == "maxabserr":
            # absent types have segment_max's -inf fill; zero them so the
            # per-type weighted mean (0 * -inf) can't produce NaN
            return jnp.where(sums["count"] > 0, sums["max"], 0.0)
        raise ValueError(metric)

    def _entry_value(self, entry, sums):
        v = self._value_from_sums(entry["metric"], sums)
        if entry["per_type"]:
            if entry["per_type_coeffs"]:
                w = jnp.asarray(
                    [float(entry["per_type_coeffs"].get(t, 0.0)) for t in self.type_names]
                )
                w = w / jnp.sum(w)
            else:
                # unweighted mean over types that appeared
                present = (sums["count"] > 0).astype(v.dtype)
                w = present / jnp.maximum(jnp.sum(present), 1.0)
            return jnp.sum(w * v)
        return v

    # ------------------------------------------------------------------
    # batch-level API (inside jit)
    # ------------------------------------------------------------------
    # ------------------------------------------------------------------
    # batch-state API: compute masked error sums once, derive loss/metrics
    # and epoch accumulation from them (and psum them for exact DP)
    # ------------------------------------------------------------------
    def batch_state(self, output: dict, target_data: dict):
        return {e["name"]: self._batch_sums(e, output, target_data) for e in self.entries}

    def psum_batch(self, bs, axis_name: str):
        """Merge masked error sums across the mesh.

        The param-dependent sums are *linearized*: the VALUE is the global
        psum but the GRADIENT flows only through the local contribution.
        ``jax.lax.psum``'s transpose is itself a psum (cotangents get summed
        across devices), so differentiating a plainly-psum'd loss and then
        psum'ing the grads would overcount by the device count; with the
        linearization, psum(local grads) is the exact global-batch gradient
        (same construction as the sharded-graph energy term in
        ``parallel/ghost.py``).
        """

        def lin(x):
            ps = jax.lax.psum(x, axis_name)
            return x + jax.lax.stop_gradient(ps - x)

        out = {}
        for name, s in bs.items():
            out[name] = {
                "abs": lin(s["abs"]),
                "sq": lin(s["sq"]),
                "count": jax.lax.psum(s["count"], axis_name),
                "max": jax.lax.pmax(s["max"], axis_name),
            }
        return out

    def values(self, bs, coeffs_vec=None):
        """(weighted_loss, values dict) from a batch state."""
        values: Dict[str, jnp.ndarray] = {}
        loss = 0.0
        for i_e, e in enumerate(self.entries):
            v = self._entry_value(e, bs[e["name"]])
            values[e["name"]] = v
            if coeffs_vec is not None:
                loss = loss + coeffs_vec[i_e].astype(v.dtype) * v
            else:
                c = self.coeffs[e["name"]]
                if c is not None:
                    loss = loss + c * v
            if e["per_type"]:
                per_type_v = self._value_from_sums(e["metric"], bs[e["name"]])
                for i, t in enumerate(self.type_names):
                    values[f"{e['name']}_{t}"] = per_type_v[i]
        values["weighted_sum"] = loss
        return loss, values

    def accumulate(self, state, bs):
        new = {}
        for e in self.entries:
            s, d = state[e["name"]], bs[e["name"]]
            new[e["name"]] = {
                "abs": s["abs"] + d["abs"],
                "sq": s["sq"] + d["sq"],
                "count": s["count"] + d["count"],
                "max": jnp.maximum(s["max"], d["max"]),
            }
        return new

    def coeff_vector(self) -> jnp.ndarray:
        """Normalized coefficients as a vector over entries (0 for metric-only
        entries).  Pass a modified copy to ``__call__`` to re-weight the loss
        at runtime (loss-coefficient schedulers, SoftAdapt) without
        recompiling the training step."""
        return jnp.asarray(
            [self.coeffs[e["name"]] or 0.0 for e in self.entries], dtype=jnp.float32
        )

    def __call__(self, output: dict, target_data: dict, coeffs_vec=None):
        """Returns (weighted_loss, per-metric batch values dict)."""
        return self.values(self.batch_state(output, target_data), coeffs_vec)

    # ------------------------------------------------------------------
    # epoch accumulation API
    # ------------------------------------------------------------------
    def init_state(self) -> Dict[str, Dict[str, jnp.ndarray]]:
        state = {}
        for e in self.entries:
            shape = (len(self.type_names),) if e["per_type"] else ()
            state[e["name"]] = {
                "abs": jnp.zeros(shape),
                "sq": jnp.zeros(shape),
                "count": jnp.zeros(shape),
                "max": jnp.full(shape, -jnp.inf),
            }
        return state

    def update_state(self, state, output: dict, target_data: dict):
        return self.accumulate(state, self.batch_state(output, target_data))

    def psum_state(self, state, axis_name: str):
        """Merge running state across a device mesh axis (DDP-exact)."""
        out = {}
        for name, s in state.items():
            out[name] = {
                "abs": jax.lax.psum(s["abs"], axis_name),
                "sq": jax.lax.psum(s["sq"], axis_name),
                "count": jax.lax.psum(s["count"], axis_name),
                "max": jax.lax.pmax(s["max"], axis_name),
            }
        return out

    def compute(self, state) -> Dict[str, float]:
        out = {}
        for e in self.entries:
            sums = {k: np.asarray(v, dtype=np.float64) for k, v in state[e["name"]].items()}
            v = self._entry_value(e, jax.tree.map(jnp.asarray, sums))
            out[e["name"]] = float(v)
            if e["per_type"]:
                per_type_v = self._value_from_sums(
                    e["metric"], jax.tree.map(jnp.asarray, sums)
                )
                for i, t in enumerate(self.type_names):
                    out[f"{e['name']}_{t}"] = float(per_type_v[i])
        comps = [
            (self.coeffs[e["name"]], out[e["name"]])
            for e in self.entries
            if self.coeffs[e["name"]] is not None
        ]
        if comps:
            out["weighted_sum"] = float(sum(c * v for c, v in comps))
        return out

    # state persistence (parity: metrics_manager.py:436-448)
    def state_dict(self) -> dict:
        return {"coeffs": dict(self.coeffs)}

    def load_state_dict(self, sd: dict) -> None:
        self.set_coeffs(sd.get("coeffs", {}))


def _with_extra(metrics, extra):
    return metrics + list(extra or [])


# ---------------------------------------------------------------------------
# canned wrappers (parity: metrics_manager.py:451-1005)
# ---------------------------------------------------------------------------
def EnergyForceLoss(
    coeffs: Dict[str, float] = None,
    per_atom_energy: bool = True,
    per_type_forces_coeffs: Optional[Dict[str, float]] = None,
    type_names: Optional[List[str]] = None,
    extra_metrics: Optional[List[Dict]] = None,
) -> MetricsManager:
    coeffs = coeffs or {_keys.TOTAL_ENERGY_KEY: 1.0, _keys.FORCE_KEY: 1.0}
    forces_entry: Dict[str, Any] = {
        "name": "forces_mse",
        "field": _keys.FORCE_KEY,
        "coeff": coeffs[_keys.FORCE_KEY],
        "metric": "mse",
    }
    if per_type_forces_coeffs is not None:
        forces_entry["per_type"] = True
        forces_entry["per_type_coeffs"] = per_type_forces_coeffs
    metrics = [
        {
            "name": "per_atom_energy_mse" if per_atom_energy else "total_energy_mse",
            "field": (
                PerAtomModifier(_keys.TOTAL_ENERGY_KEY)
                if per_atom_energy
                else _keys.TOTAL_ENERGY_KEY
            ),
            "coeff": coeffs[_keys.TOTAL_ENERGY_KEY],
            "metric": "mse",
        },
        forces_entry,
    ]
    return MetricsManager(_with_extra(metrics, extra_metrics), type_names=type_names)


def EnergyForceStressLoss(
    coeffs: Dict[str, float] = None,
    per_atom_energy: bool = True,
    type_names: Optional[List[str]] = None,
    extra_metrics: Optional[List[Dict]] = None,
) -> MetricsManager:
    coeffs = coeffs or {
        _keys.TOTAL_ENERGY_KEY: 1.0,
        _keys.FORCE_KEY: 1.0,
        _keys.STRESS_KEY: 1.0,
    }
    mgr = EnergyForceLoss(
        {k: coeffs[k] for k in (_keys.TOTAL_ENERGY_KEY, _keys.FORCE_KEY)},
        per_atom_energy,
        type_names=type_names,
        extra_metrics=_with_extra(
            [
                {
                    "name": "stress_mse",
                    "field": _keys.STRESS_KEY,
                    "coeff": coeffs[_keys.STRESS_KEY],
                    "metric": "mse",
                    "ignore_nan": True,
                }
            ],
            extra_metrics,
        ),
    )
    return mgr


def _ef_metric_entries(coeffs: Dict[str, Optional[float]]):
    field_map = {
        "total_energy": _keys.TOTAL_ENERGY_KEY,
        "per_atom_energy": PerAtomModifier(_keys.TOTAL_ENERGY_KEY),
        "forces": _keys.FORCE_KEY,
        "stress": _keys.STRESS_KEY,
    }
    entries = []
    for name, coeff in coeffs.items():
        base, _, metric = name.rpartition("_")
        assert metric in _METRIC_KINDS, f"unknown metric name {name!r}"
        assert base in field_map, f"unknown metric field in {name!r}"
        entries.append(
            {
                "name": name,
                "field": field_map[base],
                "coeff": coeff,
                "metric": metric,
                "ignore_nan": base == "stress",
            }
        )
    return entries


def EnergyForceMetrics(
    coeffs: Optional[Dict[str, Optional[float]]] = None,
    type_names: Optional[List[str]] = None,
    extra_metrics: Optional[List[Dict]] = None,
) -> MetricsManager:
    coeffs = coeffs or {
        "total_energy_rmse": 1.0,
        "per_atom_energy_rmse": None,
        "forces_rmse": 1.0,
        "total_energy_mae": None,
        "per_atom_energy_mae": None,
        "forces_mae": None,
    }
    return MetricsManager(
        _with_extra(_ef_metric_entries(coeffs), extra_metrics), type_names=type_names
    )


def EnergyForceStressMetrics(
    coeffs: Optional[Dict[str, Optional[float]]] = None,
    type_names: Optional[List[str]] = None,
    extra_metrics: Optional[List[Dict]] = None,
) -> MetricsManager:
    coeffs = coeffs or {
        "total_energy_rmse": 1.0,
        "forces_rmse": 1.0,
        "stress_rmse": 1.0,
        "total_energy_mae": None,
        "forces_mae": None,
        "stress_mae": None,
    }
    return MetricsManager(
        _with_extra(_ef_metric_entries(coeffs), extra_metrics), type_names=type_names
    )
