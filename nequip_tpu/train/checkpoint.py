"""Checkpoint save/load.

Parity goals (``/root/reference/nequip/train/lightning.py:74``,
``scripts/train.py:135-196``): a checkpoint embeds the full info needed to
rebuild everything — training-module hyperparameters (incl. the model
config), datamodule/trainer configs, run-stage bookkeeping, callback and
dataloader state — plus the complete numeric ``TrainState`` so restart is
bit-equivalent.

Format: a single pickle file containing host numpy pytrees (portable across
devices; jax arrays are device_get'd on save).
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Optional

import numpy as np
import jax

from .. import __version__


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(
    path: str,
    state,
    config: Optional[dict] = None,
    meta: Optional[dict] = None,
) -> None:
    from .state import TrainState

    payload = {
        "format_version": 1,
        "nequip_tpu_version": __version__,
        "state": _to_host(
            {
                "step": state.step,
                "params": state.params,
                "opt_state": state.opt_state,
                "rng": state.rng,
                "ema_params": state.ema_params,
                "ema_step": state.ema_step,
                "loss_state": state.loss_state,
            }
        ),
        "config": config or {},
        "meta": meta or {},
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    assert payload.get("format_version") == 1, "unknown checkpoint format"
    return payload


def state_from_payload(payload: dict, like=None):
    """Rebuild a TrainState from a checkpoint payload.

    If ``like`` (a freshly-initialized TrainState) is given, leaves are cast
    onto its structure as a sanity check.
    """
    import jax.numpy as jnp

    from .state import TrainState

    s = payload["state"]
    tree = {k: jax.tree.map(jnp.asarray, v) for k, v in s.items()}
    state = TrainState(**tree)
    if like is not None:
        for field in ("params", "opt_state", "ema_params"):
            got = jax.tree.structure(getattr(state, field))
            want = jax.tree.structure(getattr(like, field))
            assert got == want, (
                f"checkpoint {field} structure mismatch:\n{got}\nvs\n{want}"
            )
    return state
