"""Segment reductions with static shapes and padding masks.

TPU-native replacement for the reference's ``scatter_add``
(``/root/reference/nequip/nn/utils.py:24-53``).  All graphs are padded to
fixed capacities (see ``nequip_tpu.data``), so every reduction is a
``segment_sum`` with a *static* ``num_segments`` — XLA compiles it once and
lowers it to efficient on-device gathers/adds with no dynamic shapes.

Padding contract: padded rows are zeroed via ``mask`` before the reduction,
so their contributions vanish exactly (including in gradients).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def scatter_sum(
    src: jnp.ndarray,
    index: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sum rows of ``src`` into ``num_segments`` buckets given by ``index``.

    src: (M, ...); index: (M,) int; mask: optional (M,) bool — masked-out rows
    contribute nothing.
    """
    if mask is not None:
        src = jnp.where(mask.reshape((-1,) + (1,) * (src.ndim - 1)), src, 0)
    return jax.ops.segment_sum(src, index, num_segments=num_segments)


def scatter_mean(
    src: jnp.ndarray,
    index: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    total = scatter_sum(src, index, num_segments, mask)
    ones = jnp.ones(src.shape[:1], dtype=src.dtype)
    count = scatter_sum(ones, index, num_segments, mask)
    count = jnp.maximum(count, 1)
    return total / count.reshape((-1,) + (1,) * (src.ndim - 1))


def masked_gather(x: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """x[index] — indices are trusted to be in-bounds (padded edges point at the last node slot)."""
    return jnp.take(x, index, axis=0)
