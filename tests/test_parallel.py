"""Data/tensor-parallel training on the 8-virtual-device CPU mesh —
the multi-chip test substitute (SURVEY.md section 4)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from awm_tpu.config import get_config
from awm_tpu import train as tr
from awm_tpu.parallel import make_mesh, shard_batch, shard_state, param_spec


def _cfg(t=512, dtype="float32"):
    # fp32 by default: the strict SPMD-vs-single-device equivalence bounds
    # below assume fp32 numerics (bf16 has a dedicated looser test)
    cfg = dataclasses.replace(get_config("base"), audio_len=t)
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, compute_dtype=dtype)
    )


def test_mesh_shapes():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8, "model": 1}


def test_embedding_table_is_sharded():
    cfg = _cfg()
    state, gen, det = tr.init_state(cfg, jax.random.key(0))
    mesh = make_mesh(8, model_parallel=2)
    sharded = shard_state(state, mesh)
    table = sharded.params["gen"]["embedding"]["table"]
    spec = table.sharding.spec
    assert spec == P("model", None)
    # a conv kernel stays replicated
    w = sharded.params["det"]["conv_in"]["w"]
    assert w.sharding.spec == P()


def test_parallel_train_step_matches_single_device():
    """One step on the 8-device mesh must produce (numerically close to)
    the single-device result — the correctness check for the SPMD path."""
    cfg = _cfg()
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.standard_normal((8, cfg.audio_len)).astype(np.float32) * 0.3)
    key = jax.random.key(3)

    state, gen, det = tr.init_state(cfg, jax.random.key(0))
    tx = tr.make_optimizer(cfg)
    ref_state, ref_terms = tr.train_step(cfg, gen, det, tx, state, batch, key)

    mesh = make_mesh(8, model_parallel=2)
    sh_state = shard_state(state, mesh)
    sh_batch = shard_batch(batch, mesh)
    new_state, terms = tr.train_step(cfg, gen, det, tx, sh_state, sh_batch, key)

    assert abs(float(terms["total"]) - float(ref_terms["total"])) < 1e-3 * max(
        1.0, abs(float(ref_terms["total"]))
    )
    # Params after the update: Adam divides by sqrt(nu)+eps, so a
    # reduction-order-level (fp32 ulp) gradient difference on a
    # near-zero-gradient parameter can flip into an O(lr)=1e-3 step
    # difference.  Bound by a few lr to catch real sharding bugs while
    # tolerating that nondeterminism.
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), new_state.params, ref_state.params
    )
    assert max(jax.tree.leaves(diffs)) < 5e-3


def test_parallel_multiple_steps_and_eval():
    cfg = _cfg()
    rng = np.random.default_rng(1)
    batch = jnp.asarray(rng.standard_normal((16, cfg.audio_len)).astype(np.float32) * 0.3)
    mesh = make_mesh(8)
    state, gen, det = tr.init_state(cfg, jax.random.key(0))
    tx = tr.make_optimizer(cfg)
    state = shard_state(state, mesh)
    b = shard_batch(batch, mesh)
    key = jax.random.key(0)
    losses = []
    for _ in range(12):
        state, terms = tr.train_step(cfg, gen, det, tx, state, b, key)
        losses.append(float(terms["total"]))
    # random fresh messages per step make the curve noisy; compare windows
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    m = tr.evaluate_step(cfg, gen, det, state, b, key)
    assert np.isfinite(float(jnp.mean(m["watermarked_prob"])))


def test_dryrun_multichip_contract():
    """The driver-facing entry point must run on the 8-virtual-device CPU
    platform exactly as the driver invokes it."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_contract():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    s_w, logits = out
    assert s_w.shape == (4, 16000)
    assert logits.shape == (8, 16000, 17)


def test_parallel_bf16_train_step():
    """The bf16 mixed-precision step must run and make progress under the
    mesh (SPMD + mixed precision compose)."""
    cfg = _cfg(dtype="bfloat16")
    rng = np.random.default_rng(2)
    batch = jnp.asarray(rng.standard_normal((16, cfg.audio_len)).astype(np.float32) * 0.3)
    mesh = make_mesh(8)
    state, gen, det = tr.init_state(cfg, jax.random.key(0))
    tx = tr.make_optimizer(cfg)
    state = shard_state(state, mesh)
    b = shard_batch(batch, mesh)
    losses = []
    for _ in range(8):
        state, terms = tr.train_step(cfg, gen, det, tx, state, b, jax.random.key(0))
        losses.append(float(terms["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # params and optimizer state stay fp32 (mixed-precision invariant)
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(state.params)
    )


def test_pallas_lstm_shard_map_spmd_equivalence(rng):
    """lstm_impl='pallas' under the mesh: the shard_map-wrapped kernel
    (interpret mode on CPU) must match the scan path, forward AND grads —
    the multi-chip-safety contract for the production kernel."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import NamedSharding

    from awm_tpu.ops.lstm import lstm_forward
    from awm_tpu.ops.pallas.lstm_kernel import lstm_fused_auto

    mesh = make_mesh(8, model_parallel=1)
    b, t, d = 8, 32, 16
    h = 16
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32) * 0.3)
    w_ih = jnp.asarray(rng.standard_normal((4 * h, d)).astype(np.float32) * 0.1)
    w_hh = jnp.asarray(rng.standard_normal((4 * h, h)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((4 * h,)).astype(np.float32) * 0.1)

    ref_y = lstm_forward(x, w_ih, w_hh, bias)
    ref_g = jax.grad(
        lambda *a: jnp.sum(jnp.sin(lstm_forward(*a))), argnums=(0, 1, 2, 3)
    )(x, w_ih, w_hh, bias)

    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    with jax.sharding.set_mesh(mesh), pltpu.force_tpu_interpret_mode():
        y = jax.jit(lstm_fused_auto)(xs, w_ih, w_hh, bias)
        got_g = jax.jit(
            jax.grad(lambda *a: jnp.sum(jnp.sin(lstm_fused_auto(*a))), argnums=(0, 1, 2, 3))
        )(xs, w_ih, w_hh, bias)

    assert "data" in str(y.sharding.spec) or y.sharding.is_fully_replicated is False
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y), atol=2e-5)
    for name, a, c in zip(("dx", "dw_ih", "dw_hh", "db"), got_g, ref_g):
        denom = float(jnp.abs(c).max()) + 1e-9
        rel = float(jnp.abs(a - c).max()) / denom
        assert rel < 1e-4, (name, rel)


def test_lstm_fused_auto_no_mesh_is_plain_kernel(rng):
    """Without a mesh context, lstm_fused_auto must behave exactly like the
    plain kernel (single-chip path unchanged)."""
    from jax.experimental.pallas import tpu as pltpu

    from awm_tpu.ops.pallas.lstm_kernel import lstm_fused, lstm_fused_auto

    b, t, d = 2, 32, 16
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32) * 0.3)
    w_ih = jnp.asarray(rng.standard_normal((4 * d, d)).astype(np.float32) * 0.1)
    w_hh = jnp.asarray(rng.standard_normal((4 * d, d)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((4 * d,)).astype(np.float32) * 0.1)
    with pltpu.force_tpu_interpret_mode():
        a = lstm_fused_auto(x, w_ih, w_hh, bias)
        c = lstm_fused(x, w_ih, w_hh, bias)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_multihost_helpers_single_process():
    """Multi-host entry points must run correctly in the single-process
    degenerate case (the multi-process path is the same code; JAX treats
    n_processes=1 identically)."""
    from awm_tpu.parallel import (
        initialize_distributed,
        make_global_mesh,
        shard_batch_from_process_local,
    )

    assert initialize_distributed() == jax.process_count() == 1
    mesh = make_global_mesh(model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}

    local = np.random.default_rng(0).standard_normal((8, 64)).astype(np.float32)
    arr = shard_batch_from_process_local(local, mesh)
    assert arr.shape == (8, 64)
    assert arr.sharding.spec == P("data", None)
    np.testing.assert_array_equal(np.asarray(arr), local)
