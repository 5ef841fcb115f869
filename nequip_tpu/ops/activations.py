"""Scalar activations with second-moment normalization.

e3nn (used by the reference's ``Gate`` nonlinearities,
``/root/reference/nequip/nn/convnetlayer.py:96-115``) rescales every scalar
activation so that ``E_{z~N(0,1)}[act(z)^2] = 1``, keeping feature variance
stable through depth.  We compute the normalization constant with fixed
Gauss-Hermite quadrature (deterministic, accurate to ~1e-12 for smooth
activations) instead of e3nn's Monte-Carlo estimate.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp


def shifted_softplus(x):
    """softplus(x) - log(2); ssp(0) = 0.  Reference: ``nequip/nn/nonlinearities.py``."""
    return jax.nn.softplus(x) - math.log(2.0)


_BASE_ACTS = {
    "silu": jax.nn.silu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "gelu": jax.nn.gelu,
    "ssp": shifted_softplus,
    "tanh": jnp.tanh,
    "abs": jnp.abs,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    None: lambda x: x,
    "None": lambda x: x,
    "null": lambda x: x,
}

# parity of the activation function itself: +1 even, -1 odd, 0 neither
_ACT_PARITY = {
    "tanh": -1,
    "abs": 1,
    "silu": 0,
    "mish": 0,
    "gelu": 0,
    "ssp": 0,
    "sigmoid": 0,
    "softplus": 0,
    None: -1,  # identity is odd
    "None": -1,
    "null": -1,
}


# pure-numpy twins of the activations, used only for the host-side
# normalization-constant quadrature (keeps module construction jax-free)
def _np_softplus(x):
    return np.logaddexp(0.0, x)


_NP_ACTS = {
    "silu": lambda x: x / (1.0 + np.exp(-x)),
    "mish": lambda x: x * np.tanh(_np_softplus(x)),
    "gelu": lambda x: 0.5 * x * (1.0 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3))),
    "ssp": lambda x: _np_softplus(x) - math.log(2.0),
    "tanh": np.tanh,
    "abs": np.abs,
    "sigmoid": lambda x: 1.0 / (1.0 + np.exp(-x)),
    "softplus": _np_softplus,
}


@lru_cache(maxsize=None)
def second_moment(name: Optional[str]) -> float:
    """E_{z~N(0,1)}[act(z)^2] via 128-point Gauss-Hermite quadrature."""
    if name in (None, "None", "null"):
        return 1.0
    nodes, weights = np.polynomial.hermite_e.hermegauss(128)
    w = weights / np.sqrt(2.0 * np.pi)
    vals = _NP_ACTS[name](nodes)
    return float(np.sum(w * vals**2))


def normalized_activation(name: Optional[str]) -> Callable:
    """Activation scaled so a unit-normal input keeps unit second moment."""
    if name not in _BASE_ACTS:
        raise ValueError(f"unknown activation {name!r}; options: {list(_BASE_ACTS)}")
    fn = _BASE_ACTS[name]
    cst = second_moment(name) ** -0.5
    if cst == 1.0:
        return fn
    return lambda x: fn(x) * cst


def raw_activation(name: Optional[str]) -> Callable:
    if name not in _BASE_ACTS:
        raise ValueError(f"unknown activation {name!r}; options: {list(_BASE_ACTS)}")
    return _BASE_ACTS[name]


def activation_parity(name: Optional[str]) -> int:
    return _ACT_PARITY.get(name, 0)
