from .mesh import make_mesh, device_count
from .dp import (
    DataParallel,
    stack_microbatches,
    shard_batch_for_dp,
)

__all__ = [
    "make_mesh",
    "device_count",
    "DataParallel",
    "stack_microbatches",
    "shard_batch_for_dp",
]
