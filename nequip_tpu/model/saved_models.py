"""Loading models from checkpoints and package archives.

Parity: ``/root/reference/nequip/model/saved_models/`` —
``ModelFromCheckpoint`` (rebuild from training-module hyperparameters,
EMA-aware evaluation weights), ``ModelFromPackage`` (self-contained archive),
``load_saved_model`` dispatch.
"""

from __future__ import annotations

import json
import os
import zipfile
from typing import Optional, Tuple

import numpy as np

from ..utils.config import instantiate


def _module_from_checkpoint(ckpt_path: str):
    from ..train.checkpoint import load_checkpoint, state_from_payload

    payload = load_checkpoint(ckpt_path)
    tm_cfg = payload["config"].get("config", {}).get("training_module") or payload[
        "config"
    ].get("training_module")
    assert tm_cfg is not None, f"checkpoint {ckpt_path} lacks a training_module config"
    module = instantiate(tm_cfg, _recursive_=False)
    state = state_from_payload(payload)
    return module, state, payload


def ModelFromCheckpoint(ckpt_path: str, use_ema: bool = True):
    """Returns (GraphModel, params) with EMA weights when available.

    Parity: ``saved_models/checkpoint.py:27-137`` (the reference's
    ``evaluation_model`` EMA swap becomes simply choosing the params tree).
    """
    module, state, _ = _module_from_checkpoint(ckpt_path)
    params = (
        state.ema_params if (use_ema and state.ema_params is not None) else state.params
    )
    return module.model, params


def ModelFromPackage(package_path: str):
    """Load (GraphModel, params) from a ``nequip-package`` archive."""
    import pickle

    with zipfile.ZipFile(package_path) as zf:
        meta = json.loads(zf.read("package_metadata.json"))
        model_cfg = json.loads(zf.read("model_config.json"))
        params_tree = pickle.loads(zf.read("params.pkl"))
    # builder configs may contain nested sub-configs (pair_potential)
    model = instantiate(model_cfg, _recursive_=False)
    import jax.numpy as jnp
    import jax

    params = jax.tree.map(jnp.asarray, params_tree)
    return model, params


def load_saved_model(path: str, use_ema: bool = True) -> Tuple[object, dict]:
    """Dispatch on file type (checkpoint vs package archive).

    Parity: ``load_saved_model`` (``saved_models/load_utils.py:86-150``);
    the ``nequip.net:`` model-repository scheme is not yet wired (no
    network access in this environment) and raises a clear error.
    """
    if str(path).startswith("nequip.net:"):
        from ..utils.model_cache import resolve_model_id

        path = resolve_model_id(str(path))
    if zipfile.is_zipfile(path):
        return ModelFromPackage(path)
    return ModelFromCheckpoint(path, use_ema=use_ema)


def data_dict_from_checkpoint(ckpt_path: str) -> dict:
    """Re-instantiate the datamodule from the checkpoint and return one
    example padded batch (parity: ``checkpoint.py:87-137``)."""
    from ..train.checkpoint import load_checkpoint

    payload = load_checkpoint(ckpt_path)
    data_cfg = payload["config"].get("config", {}).get("data")
    assert data_cfg is not None, "checkpoint lacks a data config"
    datamodule = instantiate(data_cfg, _recursive_=False)
    datamodule.setup("fit")
    loader = datamodule.train_dataloader()
    return next(iter(loader))
