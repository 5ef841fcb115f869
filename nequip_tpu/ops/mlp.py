"""Scalar MLPs with variance-preserving alpha-scaled weights.

Behavior-parity with ``ScalarMLPFunction``
(``/root/reference/nequip/nn/mlp.py:81-271``):

* weights are initialized with unit variance (uniform in [-sqrt(3), sqrt(3)]
  or standard normal) and scaled at apply time by
  ``alpha = gain / sqrt(norm_dim)`` — ``gain = sqrt(2)`` for hidden layers
  adjoining a nonlinearity, ``norm_dim`` = fan-in (forward init) or fan-out
  (backward init).
* purely-linear deep stacks collapse to a single matmul (the reference's
  ``DeepLinearMLP`` multi_dot) — under jit XLA constant-folds the weight
  product, so we just compose matmuls.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from .activations import normalized_activation, raw_activation

_SQRT3 = math.sqrt(3.0)


class ScalarMLP:
    """Static spec + functional init/apply for a scalar-channel MLP."""

    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        hidden_layers_depth: int = 0,
        hidden_layers_width: Optional[int] = None,
        nonlinearity: Optional[str] = "silu",
        bias: bool = False,
        forward_weight_init: bool = True,
        init_mode: str = "uniform",
        parametrization: Optional[str] = None,
    ):
        if parametrization in ("None", "null"):
            parametrization = None
        assert parametrization in (None, "weight_norm", "spectral_norm", "orthogonal"), (
            f"unknown parametrization {parametrization!r}"
        )
        self.parametrization = parametrization
        if hidden_layers_depth != 0:
            assert hidden_layers_depth > 0 and hidden_layers_width > 0
        self.dims: List[int] = (
            [input_dim] + hidden_layers_depth * [hidden_layers_width or 0] + [output_dim]
        )
        self.num_layers = len(self.dims) - 1
        self.bias = bias
        self.nonlinearity = nonlinearity
        self.init_mode = init_mode
        assert init_mode in ("uniform", "normal")

        # NOTE: the reference applies the *raw* activation in MLPs (no
        # second-moment normalization there — that is a Gate-only behavior);
        # the sqrt(2) gain in alpha plays the variance-preserving role.
        self._act = raw_activation(nonlinearity) if nonlinearity is not None else None

        self.alphas: List[float] = []
        for layer, (h_in, h_out) in enumerate(zip(self.dims, self.dims[1:])):
            if forward_weight_init:
                norm_dim = h_in
                gain = 1.0 if nonlinearity is None or layer == 0 else math.sqrt(2.0)
            else:
                norm_dim = h_out
                gain = (
                    1.0
                    if nonlinearity is None or layer == self.num_layers - 1
                    else math.sqrt(2.0)
                )
            self.alphas.append(gain / math.sqrt(norm_dim))

    @property
    def output_dim(self) -> int:
        return self.dims[-1]

    def init(self, rng) -> Dict[str, jnp.ndarray]:
        params: Dict[str, jnp.ndarray] = {}
        keys = jax.random.split(rng, self.num_layers)
        for layer, (h_in, h_out) in enumerate(zip(self.dims, self.dims[1:])):
            if self.init_mode == "uniform":
                w = jax.random.uniform(
                    keys[layer], (h_in, h_out), minval=-_SQRT3, maxval=_SQRT3
                )
            else:
                w = jax.random.normal(keys[layer], (h_in, h_out))
            params[f"w{layer}"] = w
            if self.parametrization == "weight_norm":
                # g initialized to the row norms so the initial effective
                # weight equals the plain initialization (torch semantics)
                params[f"g{layer}"] = jnp.linalg.norm(w, axis=1)
            if self.bias:
                params[f"b{layer}"] = jnp.zeros((h_out,))
        return params

    def _parametrized(self, params, layer, dtype):
        """Effective weight under the configured reparametrization.

        Functional analogs of the reference's torch parametrizations
        (``nn/mlp.py:163-180``): weight_norm splits direction/magnitude,
        spectral_norm divides by the exact largest singular value (no
        power-iteration buffers needed under jit), orthogonal maps the raw
        matrix to its (sign-fixed) QR orthogonal factor.
        """
        v = params[f"w{layer}"].astype(dtype)
        p = self.parametrization
        if p is None:
            return v
        if p == "weight_norm":
            g = params[f"g{layer}"].astype(dtype)
            return g[:, None] * v / (jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-12)
        if p == "spectral_norm":
            sigma = jnp.linalg.matrix_norm(v.astype(jnp.float32), ord=2).astype(dtype)
            return v / (sigma + 1e-12)
        # orthogonal: QR with the R-diagonal sign fixed for uniqueness
        tall = v.shape[0] >= v.shape[1]
        m = v.astype(jnp.float32) if tall else v.astype(jnp.float32).T
        q, r = jnp.linalg.qr(m)
        q = q * jnp.sign(jnp.diagonal(r))[None, :]
        return (q if tall else q.T).astype(dtype)

    def __call__(self, params: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
        for layer in range(self.num_layers):
            w = self._parametrized(params, layer, x.dtype) * self.alphas[layer]
            x = jnp.matmul(x, w, preferred_element_type=x.dtype)
            if self.bias:
                x = x + params[f"b{layer}"].astype(x.dtype)
            if self._act is not None and layer != self.num_layers - 1:
                x = self._act(x)
        return x
