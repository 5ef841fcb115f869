"""Muon optimizer (Newton-Schulz orthogonalized momentum) as an optax
transform, plus the NequIP-style Muon/Adam param-group split.

Parity: ``/root/reference/nequip/train/muon.py`` (adapted from Keller
Jordan's public Muon) and ``model/param_groups.py:23-97`` — 2D weight
matrices (conv/edge-MLP weights) go to Muon, everything else to Adam.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def zeropower_via_newtonschulz5(G: jnp.ndarray, steps: int = 5) -> jnp.ndarray:
    """Approximate UV^T (orthogonalization) of a 2D matrix via the quintic
    Newton-Schulz iteration (coefficients from the public Muon)."""
    assert G.ndim == 2
    a, b, c = 3.4445, -4.7750, 2.0315
    X = G.astype(jnp.float32)
    transpose = G.shape[0] > G.shape[1]
    if transpose:
        X = X.T
    X = X / (jnp.linalg.norm(X) + 1e-7)

    def body(_, X):
        A = X @ X.T
        B = b * A + c * (A @ A)
        return a * X + B @ X

    X = jax.lax.fori_loop(0, steps, body, X)
    if transpose:
        X = X.T
    return X.astype(G.dtype)


class MuonState(NamedTuple):
    momentum: optax.Updates


def muon(
    learning_rate: float = 0.02,
    momentum: float = 0.95,
    nesterov: bool = True,
    ns_steps: int = 5,
) -> optax.GradientTransformation:
    """Muon for 2D parameters (non-2D leaves fall back to plain momentum SGD
    semantics without orthogonalization)."""

    def init_fn(params):
        return MuonState(momentum=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        buf = jax.tree.map(lambda m, g: momentum * m + g, state.momentum, updates)
        eff = (
            jax.tree.map(lambda g, m: g + momentum * m, updates, buf)
            if nesterov
            else buf
        )

        def transform(g):
            if g.ndim == 2:
                o = zeropower_via_newtonschulz5(g, ns_steps)
                # scale heuristic from Muon: sqrt(max(1, rows/cols))
                scale = max(1.0, g.shape[0] / g.shape[1]) ** 0.5
                return -learning_rate * scale * o
            return -learning_rate * g

        return jax.tree.map(transform, eff), MuonState(momentum=buf)

    return optax.GradientTransformation(init_fn, update_fn)


def muon_adam(
    muon_lr: float = 0.02,
    adam_lr: float = 1e-3,
    momentum: float = 0.95,
    nesterov: bool = True,
    ns_steps: int = 5,
    adam_betas=(0.9, 0.999),
    adam_eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Split transform: Muon for 2D matrices, Adam for everything else.

    Parity: ``MuonParamGroups`` (``model/param_groups.py``).
    """

    def label_fn(params):
        return jax.tree.map(lambda p: "muon" if p.ndim == 2 else "adam", params)

    return optax.multi_transform(
        {
            "muon": muon(muon_lr, momentum, nesterov, ns_steps),
            "adam": optax.adam(adam_lr, b1=adam_betas[0], b2=adam_betas[1], eps=adam_eps),
        },
        label_fn,
    )
