"""Radial basis functions and cutoff envelopes.

Behavior-parity with the reference:
* ``polynomial_cutoff`` — DimeNet envelope,
  ``/root/reference/nequip/nn/embedding/cutoffs.py:5-27``.
* ``bessel_basis`` — ``sinc(x * n) * n`` over n = 1..num_bessels (note
  ``sinc(t) = sin(pi t)/(pi t)``),
  ``/root/reference/nequip/nn/embedding/_edge.py:110-160``.
"""

from __future__ import annotations

import jax.numpy as jnp


def polynomial_cutoff(x: jnp.ndarray, p: float = 6.0) -> jnp.ndarray:
    """Smooth envelope: 1 at x=0, 0 (with p-1 vanishing derivatives) at x=1.

    ``x`` is the cutoff-normalized edge length; values >= 1 give exactly 0.
    """
    p = float(p)
    out = 1.0
    out = out - ((p + 1.0) * (p + 2.0) / 2.0) * jnp.power(x, p)
    out = out + p * (p + 2.0) * jnp.power(x, p + 1.0)
    out = out - (p * (p + 1.0) / 2.0) * jnp.power(x, p + 2.0)
    return out * (x < 1.0)


def sinc(x: jnp.ndarray) -> jnp.ndarray:
    """sin(pi x)/(pi x) with the removable singularity handled (sinc(0)=1)."""
    px = jnp.pi * jnp.where(x == 0, 1.0, x)
    return jnp.where(x == 0, 1.0, jnp.sin(px) / px)


def bessel_basis(x: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """(..., 1) normalized lengths, (num_bessels,) weights -> (..., num_bessels).

    ``weights`` defaults to 1..num_bessels; trainable in the reference when
    ``bessel_trainable=True``.
    """
    return sinc(x * weights) * weights
