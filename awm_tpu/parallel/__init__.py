from awm_tpu.parallel.mesh import (
    make_mesh,
    param_spec,
    state_shardings,
    shard_state,
    shard_batch,
    batch_sharding,
    replicated,
)

__all__ = [
    "make_mesh",
    "param_spec",
    "state_shardings",
    "shard_state",
    "shard_batch",
    "batch_sharding",
    "replicated",
]
