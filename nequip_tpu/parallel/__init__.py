from .mesh import make_mesh, device_count
from .distributed import init_distributed
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
from .spatial_train import (
    EMASpatialTrainModule,
    SpatialFrameDataModule,
    SpatialFrameLoader,
    SpatialTrainModule,
    make_2d_mesh,
    prepare_spatial_batch,
)

__all__ = [
    "make_mesh",
    "init_distributed",
    "device_count",
    "DataParallel",
    "stack_microbatches",
    "shard_batch_for_dp",
    "ShardedGraphEvaluator",
    "spatial_partition",
    "enable_MeshGhostExchange",
    "disable_MeshGhostExchange",
    "SpatialTrainModule",
    "EMASpatialTrainModule",
    "SpatialFrameLoader",
    "SpatialFrameDataModule",
    "make_2d_mesh",
    "prepare_spatial_batch",
]
