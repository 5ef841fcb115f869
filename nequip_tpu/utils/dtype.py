"""Model-dtype context and dtype utilities.

Parity with ``/root/reference/nequip/utils/dtype.py``: a context manager that
sets the "default dtype" modules capture at construction time, plus the
compile-tolerance table used by the jit-vs-eager self-checks.
"""

from __future__ import annotations

import contextlib
import contextvars
import os
from typing import Union

import jax.numpy as jnp

_DTYPE_MAP = {
    "float32": jnp.float32,
    "float64": jnp.float64,
    "bfloat16": jnp.bfloat16,
}

_default_dtype: contextvars.ContextVar = contextvars.ContextVar(
    "nequip_tpu_default_dtype", default=jnp.float32
)


def dtype_from_name(name: Union[str, object]):
    if isinstance(name, str):
        return _DTYPE_MAP[name]
    return name


def dtype_to_name(dtype) -> str:
    for k, v in _DTYPE_MAP.items():
        if v == dtype:
            return k
    return str(dtype)


def get_default_dtype():
    """The dtype modules capture at construction (the ``model_dtype``)."""
    return _default_dtype.get()


@contextlib.contextmanager
def default_dtype(dtype):
    """Context manager analog of ``torch_default_dtype`` (``utils/dtype.py``)."""
    token = _default_dtype.set(dtype_from_name(dtype))
    try:
        yield
    finally:
        _default_dtype.reset(token)


# jit-vs-eager numeric self-check tolerances (MaxAbsErr), env-tunable like the
# reference's NEQUIP_FLOAT{64,32}_MODEL_TOL (``utils/dtype.py:35-43``)
_MODEL_TOLS = {
    jnp.float64: float(os.environ.get("NEQUIP_FLOAT64_MODEL_TOL", 1e-12)),
    jnp.float32: float(os.environ.get("NEQUIP_FLOAT32_MODEL_TOL", 5e-5)),
}


def model_tolerance(dtype) -> float:
    return _MODEL_TOLS[dtype_from_name(dtype)]
