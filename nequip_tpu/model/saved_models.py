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
    """Load (GraphModel, params) from a ``nequip-package`` archive.

    Enforces the archive format-version compat table and, when the installed
    framework can no longer rebuild an old config (builder-schema drift),
    points at the archive's interned code snapshot instead of failing with
    an opaque TypeError (durability parity with torch.package code
    interning, ``/root/reference/nequip/scripts/package.py:52-64``).
    """
    import pickle

    from ..scripts.package import SUPPORTED_PACKAGE_FORMATS

    with zipfile.ZipFile(package_path) as zf:
        meta = json.loads(zf.read("package_metadata.json"))
        model_cfg = json.loads(zf.read("model_config.json"))
        params_tree = pickle.loads(zf.read("params.pkl"))
        has_snapshot = "code_snapshot.zip" in zf.namelist()
    fmt = int(meta.get("package_format_version", 1))
    if fmt not in SUPPORTED_PACKAGE_FORMATS:
        raise RuntimeError(
            f"package {package_path!r} has format version {fmt}; this "
            f"framework version supports {SUPPORTED_PACKAGE_FORMATS}. "
            + (
                "Recover with `nequip-package extract-code` + PYTHONPATH."
                if has_snapshot
                else "Re-export it with a framework version that wrote it."
            )
        )
    try:
        # builder configs may contain nested sub-configs (pair_potential)
        model = instantiate(model_cfg, _recursive_=False)
    except TypeError as e:
        hint = (
            f"run `nequip-package extract-code {package_path} <dir>` and load "
            f"with PYTHONPATH=<dir> (the archive interns the source tree that "
            f"built this model, version {meta.get('nequip_tpu_version')})"
            if has_snapshot
            else f"install nequip-tpu=={meta.get('nequip_tpu_version')}"
        )
        raise RuntimeError(
            f"cannot rebuild the packaged model with the installed framework "
            f"(builder config schema drift: {e}); {hint}"
        ) from e
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
