"""Exponential moving average of parameters.

Parity: ``EMALightningModule`` (``/root/reference/nequip/train/ema.py``):
warmup-corrected decay ``min(decay, (1+n)/(10+n))`` and lerp update
``ema += (1-decay_eff) * (params - ema)``.  The reference's weight-*swap*
machinery (to reuse a compiled model) is unnecessary here — evaluation just
runs the jitted forward with ``ema_params``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, ema_step, decay: float):
    """One EMA step; returns (new_ema_params, new_ema_step)."""
    n = ema_step.astype(jnp.float32)
    decay_eff = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    w = 1.0 - decay_eff

    new_ema = jax.tree.map(
        lambda e, p: e + w.astype(e.dtype) * (p.astype(e.dtype) - e), ema_params, params
    )
    return new_ema, ema_step + 1
