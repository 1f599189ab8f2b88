from awm_tpu.parallel.mesh import (
    make_mesh,
    param_spec,
    state_shardings,
    shard_state,
    shard_batch,
    batch_sharding,
    replicated,
    initialize_distributed,
    make_global_mesh,
    shard_batch_from_process_local,
)

__all__ = [
    "make_mesh",
    "param_spec",
    "state_shardings",
    "shard_state",
    "shard_batch",
    "batch_sharding",
    "replicated",
    "initialize_distributed",
    "make_global_mesh",
    "shard_batch_from_process_local",
]
