"""Multi-chip scaling: device mesh, sharding rules, sharded train/infer."""

from .distributed import (
    DataParallelPatchRunner,
    make_fold_parallel_forward,
    make_sharded_train_step,
    pad_folds_for_axis,
    shard_train_state,
)
from .mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    spatial_sharding,
)

__all__ = [
    "DataParallelPatchRunner",
    "make_fold_parallel_forward",
    "make_sharded_train_step",
    "pad_folds_for_axis",
    "shard_train_state",
    "batch_sharding",
    "make_mesh",
    "param_shardings",
    "replicated",
    "spatial_sharding",
]
