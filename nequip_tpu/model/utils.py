"""The ``@model_builder`` contract.

Parity: ``/root/reference/nequip/model/utils.py:104-230``: every model
builder requires ``seed``, ``model_dtype`` and ``type_names``; runs under an
isolated default-dtype context; nested builders inherit those settings; the
result is wrapped in (or already is) a ``GraphModel``.

TPU-native differences: there is no compile-mode dispatch (jit is always the
execution mode and needs no train-time wrapper thanks to static padded
shapes), and RNG isolation is structural — the builder records ``seed`` and
``GraphModel.init_params()`` derives a fresh ``jax.random.PRNGKey`` from it.
"""

from __future__ import annotations

import contextvars
import functools
from typing import Optional

import jax

from ..nn.graph_model import GraphModel
from ..utils.dtype import default_dtype, dtype_from_name

_BUILDER_CONTEXT: contextvars.ContextVar = contextvars.ContextVar(
    "nequip_tpu_model_builder_ctx", default=None
)


def model_builder(func):
    """Decorator for model builder functions."""

    @functools.wraps(func)
    def wrapper(
        *args,
        seed: Optional[int] = None,
        model_dtype: Optional[str] = None,
        type_names=None,
        **kwargs,
    ):
        parent = _BUILDER_CONTEXT.get()
        if parent is not None:
            # nested builder: inherit contract args from the outer builder
            seed = parent["seed"] if seed is None else seed
            model_dtype = parent["model_dtype"] if model_dtype is None else model_dtype
            type_names = parent["type_names"] if type_names is None else type_names
        else:
            assert seed is not None, f"{func.__name__} requires `seed`"
            assert model_dtype is not None, f"{func.__name__} requires `model_dtype`"
        assert type_names is not None, f"{func.__name__} requires `type_names`"

        ctx = {"seed": seed, "model_dtype": model_dtype, "type_names": type_names}
        token = _BUILDER_CONTEXT.set(ctx)
        try:
            with default_dtype(dtype_from_name(model_dtype)):
                model = func(*args, type_names=type_names, **kwargs)
        finally:
            _BUILDER_CONTEXT.reset(token)

        if parent is not None:
            # inner builders return the bare module; only the outermost wraps
            return model
        if not isinstance(model, GraphModel):
            model = GraphModel(model, type_names=list(type_names))
        model.seed = seed
        model.model_config = {
            "seed": seed,
            "model_dtype": model_dtype,
            "type_names": list(type_names),
            **{k: v for k, v in kwargs.items() if _is_config_value(v)},
            "_target_": f"{func.__module__}.{func.__name__}",
        }
        model.init_params = lambda: model.init(jax.random.PRNGKey(seed))
        return model

    wrapper._is_model_builder = True
    return wrapper


def _is_config_value(v) -> bool:
    if isinstance(v, (int, float, str, bool, type(None))):
        return True
    if isinstance(v, (list, tuple)):
        return all(_is_config_value(x) for x in v)
    if isinstance(v, dict):
        return all(isinstance(k, str) and _is_config_value(x) for k, x in v.items())
    return False
