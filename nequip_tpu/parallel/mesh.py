"""Device-mesh construction helpers.

The TPU-native replacement for the reference's NCCL/torch.distributed setup
(``/root/reference/nequip/train/simple_ddp.py``): parallelism is expressed as
a ``jax.sharding.Mesh`` over ICI (+DCN for multislice), and the training step
runs under ``shard_map`` with explicit collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh


def device_count() -> int:
    return jax.device_count()


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("dp",),
) -> Mesh:
    """Build a mesh; defaults to all devices on one data-parallel axis."""
    if axis_sizes is None:
        axis_sizes = (jax.device_count(),)
    return jax.make_mesh(tuple(axis_sizes), tuple(axis_names))
