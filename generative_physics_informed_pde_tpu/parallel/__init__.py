"""Parallel execution: device meshes, sharded training, study pools."""

from .mesh import (make_mesh, replicated, batch_sharding,
                   mc_batch_sharding, shard_data_dict, shard_train_state)
from .study import (DummyFuture, DummyProcessPool, ThreadPool,
                    sweep_over_devices)

__all__ = ["make_mesh", "replicated", "batch_sharding",
           "mc_batch_sharding", "shard_data_dict",
           "shard_train_state", "DummyFuture", "DummyProcessPool",
           "ThreadPool", "sweep_over_devices"]
