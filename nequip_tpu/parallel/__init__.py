from .mesh import make_mesh, device_count
from .dp import (
    DataParallel,
    stack_microbatches,
    shard_batch_for_dp,
)
from .ghost import (
    ShardedGraphEvaluator,
    spatial_partition,
    enable_MeshGhostExchange,
    disable_MeshGhostExchange,
)

__all__ = [
    "make_mesh",
    "device_count",
    "DataParallel",
    "stack_microbatches",
    "shard_batch_for_dp",
    "ShardedGraphEvaluator",
    "spatial_partition",
    "enable_MeshGhostExchange",
    "disable_MeshGhostExchange",
]
