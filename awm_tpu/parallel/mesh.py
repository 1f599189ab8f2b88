"""Device-mesh sharding: data-parallel training + tensor-parallel embedding.

The reference is single-process, single-GPU — no DDP/NCCL anywhere
(SURVEY.md section 2.5).  The TPU build makes data parallelism the
first-class strategy: a ('data', 'model') mesh where

- batches are sharded over 'data' (each chip sees B/n_data clips; XLA
  inserts the gradient all-reduce over ICI automatically because parameters
  are replicated across 'data'),
- the one genuinely large parameter — the 2^16 x 64 message embedding table
  (16 MB fp32, dwarfing the ~350 KB of conv/LSTM weights) — is sharded over
  'model' along the vocab axis (tensor parallelism; XLA turns the lookup
  into a sharded gather + psum).

Pipeline/sequence/expert parallelism are deliberately N/A for this model
family: two conv blocks deep (no pipeline stages), fixed T=16000 handled by
chunk-batching rather than sequence sharding (SURVEY.md section 5
"long-context"), and no experts.  The mesh API still exposes the 'model'
axis so larger variants shard without code changes.

Computation follows data: shard the state and batch with device_put and the
already-jitted train step runs SPMD — the idiomatic JAX pattern, no
torch.distributed-style wrappers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    *,
    devices=None,
) -> Mesh:
    """('data', 'model') mesh over the first n_devices devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % model_parallel:
        raise ValueError(f"{n_devices} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel
    )
    return Mesh(grid, ("data", "model"))


def _is_embedding_table(path) -> bool:
    keys = [getattr(p, "key", "") for p in path]
    return "table" in keys


def param_spec(path, leaf, mesh: Mesh) -> P:
    """Sharding rule per parameter: embedding vocab over 'model', else
    replicated (52k-5M param nets don't need TP beyond the table)."""
    model_size = mesh.shape["model"]
    if (
        _is_embedding_table(path)
        and leaf.ndim == 2
        and leaf.shape[0] % model_size == 0
    ):
        return P("model", None)
    return P()


def state_shardings(state, mesh: Mesh):
    """Sharding pytree matching a TrainState (params/batch_stats/opt_state).

    optax.adam's state mirrors the param tree (mu/nu), so the same rule
    applies leaf-wise by shape: any 2D leaf whose vocab dim matches a
    sharded table gets the table spec.  Simpler and robust: walk with paths
    and reuse param_spec wherever the path contains a 'table' key.
    """

    def spec_for(path, leaf):
        if hasattr(leaf, "ndim") and leaf.ndim:
            return NamedSharding(mesh, param_spec(path, leaf, mesh))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, state)


def shard_state(state, mesh: Mesh):
    """Place a TrainState on the mesh according to the sharding rules."""
    return jax.device_put(state, state_shardings(state, mesh))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data", None))


def shard_batch(batch: jnp.ndarray, mesh: Mesh):
    """Shard a (B, T) batch over the 'data' axis.  B must divide evenly."""
    return jax.device_put(batch, batch_sharding(mesh))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# multi-host (multi-process) readiness
#
# The reference is strictly single-process (SURVEY.md section 2.5).  This
# build's multi-host story: one JAX process per host, jax.distributed wiring
# the coordinator, and ONE global ('data', 'model') mesh over all processes'
# devices.  Axis placement follows the bandwidth hierarchy: 'model'
# (tensor-parallel embedding shards, per-lookup collectives) stays INSIDE a
# host's ICI domain; 'data' (one gradient all-reduce per step) spans hosts,
# so only the low-frequency collective ever rides DCN.  Verified with TRUE
# multi-process SPMD on this image: tools/multihost_drill.py runs the full
# train step across 2 OS processes x 4 virtual CPU devices (jax.distributed
# + Gloo collectives) and matches the single-process result
# (tests/test_multihost.py, evidence/multihost/summary.json).


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host entry point: wire this process into the cluster.

    On TPU pods with standard env (TPU_WORKER_HOSTNAMES etc.) all arguments
    auto-detect; pass them explicitly elsewhere.  Idempotent: safe to call
    when already initialized or when single-process (returns the process
    count either way).
    """
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        # single-process run: nothing to wire
        return jax.process_count()
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized
    return jax.process_count()


def make_global_mesh(model_parallel: int = 1) -> Mesh:
    """('data', 'model') mesh over ALL processes' devices.

    Uses mesh_utils.create_device_mesh so the axis-to-topology assignment is
    ICI-aware; with model_parallel <= devices-per-host the 'model' axis stays
    within each host's ICI domain and 'data' spans hosts over DCN.
    """
    import jax
    from jax.experimental import mesh_utils

    n = len(jax.devices())
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = mesh_utils.create_device_mesh((n // model_parallel, model_parallel))
    return Mesh(grid, ("data", "model"))


def shard_batch_from_process_local(local_batch, mesh: Mesh):
    """Assemble the GLOBAL batch from per-process local shards.

    Each host feeds only its own (B_local, T) array (B_local = B_global /
    n_processes from its own input-pipeline shard); the returned global
    array is sharded P('data', None) without any cross-host data movement.
    Single-process, this is equivalent to shard_batch.
    """
    import jax

    return jax.make_array_from_process_local_data(batch_sharding(mesh), local_batch)
