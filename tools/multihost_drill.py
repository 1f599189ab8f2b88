#!/usr/bin/env python
"""Multi-host SPMD drill: run the REAL train step across 2 JAX processes.

VERDICT round-2 weak item 6 called the multi-host path "code, not
evidence": `initialize_distributed` / `make_global_mesh` /
`shard_batch_from_process_local` (awm_tpu/parallel/mesh.py) were exercised
only with n_processes=1.  This drill closes that gap without TPU pods: JAX's
CPU backend supports true multi-process clusters (distributed coordinator +
Gloo collectives), so we launch TWO OS processes x 4 virtual CPU devices
each and run the production train step over the global ('data'=4,
'model'=2) mesh — the same process topology a 2-host TPU pod slice has
(the reference is strictly single-process; SURVEY.md section 2.5).

What is verified end-to-end:
- jax.distributed wiring via initialize_distributed (process_count == 2,
  8 global / 4 local devices per process)
- make_global_mesh axis layout and the tensor-parallel embedding-table
  sharding (P('model', None)) with only the local vocab shard resident
- per-process input pipeline: each process feeds ONLY its local batch rows
  through shard_batch_from_process_local; a replicated-output jit verifies
  the assembled global array matches the intended global batch row-for-row
- TWO optimizer steps of the full jitted train_step (losses, gradients
  including cross-process all-reduce, Adam update) — losses must agree
  EXACTLY across the two processes (SPMD) and match a single-process
  8-device reference run within fp32 reduction-order tolerance

Modes (dispatched on argv):
  tools/multihost_drill.py                  parent: spawns ref + 2 workers,
                                            compares, prints a summary JSON
  tools/multihost_drill.py worker I N PORT OUT   one cluster process
  tools/multihost_drill.py ref OUT               single-process reference
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile

N_PROC = 2
LOCAL_DEVICES = 4  # per process -> 8 global, matching the test mesh
AUDIO_LEN = 512    # tiny static shape: compile time, not model fidelity
GLOBAL_BATCH = 8


def _setup_jax():
    """CPU platform + shared compile cache (sitecustomize pins the TPU
    tunnel platform; config.update after import is the supported override)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/awm_tpu_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax


def _tiny_cfg():
    import dataclasses

    from awm_tpu.config import get_config

    return dataclasses.replace(get_config("base"), audio_len=AUDIO_LEN)


def _global_batch():
    import numpy as np

    rng = np.random.default_rng(0)
    return (rng.standard_normal((GLOBAL_BATCH, AUDIO_LEN)) * 0.3).astype(np.float32)


def _two_steps(jax, state, mesh):
    """Shard state, run two train steps on the global batch; return losses
    and the assembled batch's replicated row-means (assembly check)."""
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from awm_tpu import train as tr
    from awm_tpu.parallel import shard_state
    from awm_tpu.parallel.mesh import shard_batch_from_process_local

    cfg = _tiny_cfg()
    state, gen, det = state
    tx = tr.make_optimizer(cfg)
    state = shard_state(state, mesh)

    g = _global_batch()
    rows_per_proc = GLOBAL_BATCH // jax.process_count()
    lo = jax.process_index() * rows_per_proc
    local = g[lo : lo + rows_per_proc]
    batch = shard_batch_from_process_local(local, mesh)

    # end-to-end row-mapping check: replicated output is readable everywhere
    row_means = jax.jit(
        lambda x: jnp.mean(x, axis=1), out_shardings=NamedSharding(mesh, P())
    )(batch)
    assembly_err = float(np.abs(np.asarray(row_means) - g.mean(axis=1)).max())

    losses = []
    for step in range(2):
        state, terms = tr.train_step(
            cfg, gen, det, tx, state, batch, jax.random.key(100 + step)
        )
        losses.append(float(terms["total"]))
    table = state.params["gen"]["embedding"]["table"]
    return {
        "losses": losses,
        "assembly_err": assembly_err,
        "table_spec": str(table.sharding.spec),
        "table_local_shard_rows": int(
            table.addressable_shards[0].data.shape[0]
        ),
        "table_global_rows": int(table.shape[0]),
    }


def run_worker(pid: int, nproc: int, port: int, out: str) -> None:
    jax = _setup_jax()
    from awm_tpu.parallel import initialize_distributed, make_global_mesh
    from awm_tpu import train as tr

    n = initialize_distributed(f"localhost:{port}", nproc, pid)
    assert n == nproc, (n, nproc)
    assert jax.process_count() == nproc
    assert len(jax.local_devices()) == LOCAL_DEVICES
    assert len(jax.devices()) == nproc * LOCAL_DEVICES
    mesh = make_global_mesh(model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}, mesh.shape

    # Warm-up barrier: establish every Gloo channel BEFORE the first real
    # cross-process op.  Without this, channel setup happens lazily inside
    # jax's device_put equality check and a connection-timing race failed
    # ~1 in 3 cold runs (round-3 ADVICE/VERDICT).  The barrier itself gets
    # a short localized retry so a slow peer only costs seconds, not a
    # whole-drill rerun.
    import time
    from jax.experimental import multihost_utils

    for i in range(3):
        try:
            multihost_utils.sync_global_devices("awm_drill_warmup")
            break
        except Exception:  # pragma: no cover - timing dependent
            if i == 2:
                raise
            time.sleep(1.0 + i)

    cfg = _tiny_cfg()
    res = _two_steps(jax, tr.init_state(cfg, jax.random.key(0)), mesh)
    res.update(process_id=pid, process_count=n,
               n_global_devices=len(jax.devices()),
               n_local_devices=len(jax.local_devices()))
    with open(out, "w") as f:
        json.dump(res, f)


def run_ref(out: str) -> None:
    """Single-process 8-virtual-device reference (same mesh shape)."""
    jax = _setup_jax()
    from awm_tpu.parallel import make_global_mesh
    from awm_tpu import train as tr

    assert len(jax.devices()) == N_PROC * LOCAL_DEVICES
    mesh = make_global_mesh(model_parallel=2)
    cfg = _tiny_cfg()
    res = _two_steps(jax, tr.init_state(cfg, jax.random.key(0)), mesh)
    with open(out, "w") as f:
        json.dump(res, f)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_parent(retries: int = 1) -> int:
    """Launch ref + cluster, compare.  Prints exactly ONE summary JSON (the
    final attempt's) to stdout; earlier failed attempts log to stderr only.

    The round-3 Gloo connection-timing flake (~1 in 3 cold runs, surfacing
    inside jax's cross-process device_put equality check) is fixed at the
    source: workers now open all Gloo channels with an explicit barrier
    right after jax.distributed init (see run_worker), before any real
    collective.  The retry remains as a safety net for genuine transient
    failures (port races etc.); a real SPMD bug still fails every attempt."""
    rc, summary = 1, ""
    for attempt in range(retries + 1):
        rc, summary = _run_parent_once()
        if rc == 0:
            break
        if attempt < retries:
            print(f"multihost_drill: attempt {attempt} failed, retrying\n"
                  f"{summary}", file=sys.stderr)
    print(summary)
    return rc


def _run_parent_once():
    """One attempt; returns (rc, summary_json_str) without printing."""
    here = os.path.abspath(__file__)
    repo = os.path.dirname(os.path.dirname(here))
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
        ).strip()
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    with tempfile.TemporaryDirectory() as d:
        outs = [os.path.join(d, f"w{i}.json") for i in range(N_PROC)]
        ref_out = os.path.join(d, "ref.json")
        # reference runs with 8 devices in ONE process
        env_ref = dict(env)
        env_ref["XLA_FLAGS"] = flags + (
            f" --xla_force_host_platform_device_count={N_PROC * LOCAL_DEVICES}"
        )
        ref_p = subprocess.Popen(
            [sys.executable, here, "ref", ref_out], env=env_ref, cwd=repo
        )
        port = _free_port()
        workers = [
            subprocess.Popen(
                [sys.executable, here, "worker", str(i), str(N_PROC),
                 str(port), outs[i]],
                env=env, cwd=repo,
            )
            for i in range(N_PROC)
        ]
        fails = []
        for name, p in [("ref", ref_p)] + [
            (f"worker{i}", w) for i, w in enumerate(workers)
        ]:
            rc = p.wait(timeout=600)
            if rc != 0:
                fails.append(f"{name} exited {rc}")
        if fails:
            return 1, json.dumps({"ok": False, "fails": fails})
        ref = json.load(open(ref_out))
        ws = [json.load(open(o)) for o in outs]

        checks = {
            "process_count": all(w["process_count"] == N_PROC for w in ws),
            "global_devices": all(
                w["n_global_devices"] == N_PROC * LOCAL_DEVICES for w in ws
            ),
            # SPMD: both processes observe the identical global loss
            "losses_identical_across_processes": ws[0]["losses"] == ws[1]["losses"],
            # per-process feeding assembled the intended global batch
            # (fp32 mean reduction-order noise only)
            "batch_assembly_exact": all(w["assembly_err"] <= 1e-6 for w in ws),
            # tensor-parallel table: vocab sharded over 'model' (spec str
            # normalizes a trailing None away), half the rows per process
            "table_sharded": all(
                w["table_spec"].startswith("PartitionSpec('model'")
                and w["table_local_shard_rows"] * 2 == w["table_global_rows"]
                for w in ws
            ),
            # multi-process == single-process within fp32 reduction-order
            # tolerance (same bound family as test_parallel equivalence)
            "matches_single_process": all(
                abs(a - b) <= 1e-3 * max(1.0, abs(b))
                for a, b in zip(ws[0]["losses"], ref["losses"])
            ),
        }
        summary = {
            "ok": all(checks.values()),
            "checks": checks,
            "losses_multiprocess": ws[0]["losses"],
            "losses_single_process": ref["losses"],
            "table": {
                "spec": ws[0]["table_spec"],
                "local_rows": ws[0]["table_local_shard_rows"],
                "global_rows": ws[0]["table_global_rows"],
            },
        }
        return (0 if summary["ok"] else 1), json.dumps(summary, indent=2)


def main() -> int:
    if len(sys.argv) >= 2 and sys.argv[1] == "worker":
        run_worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                   sys.argv[5])
        return 0
    if len(sys.argv) >= 2 and sys.argv[1] == "ref":
        run_ref(sys.argv[2])
        return 0
    return run_parent()


if __name__ == "__main__":
    sys.exit(main())
