"""Parallel execution: device meshes, sharded training, study pools,
multi-host (DCN) distribution."""

from .mesh import (make_mesh, replicated, batch_sharding,
                   mc_batch_sharding, shard_data_dict, shard_train_state)
from .study import (DummyFuture, DummyProcessPool, ThreadPool,
                    sweep_over_devices)
from .distributed import (initialize, process_count, process_index,
                          make_hybrid_mesh, local_shard_slice,
                          global_array_from_local, fetch,
                          sweep_over_processes)

__all__ = ["make_mesh", "replicated", "batch_sharding",
           "mc_batch_sharding", "shard_data_dict",
           "shard_train_state", "DummyFuture", "DummyProcessPool",
           "ThreadPool", "sweep_over_devices",
           "initialize", "process_count", "process_index",
           "make_hybrid_mesh", "local_shard_slice",
           "global_array_from_local", "fetch", "sweep_over_processes"]
