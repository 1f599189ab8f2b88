"""Fused Pallas LSTM: the latency-dominant op of the generator, on-chip.

Why: the reference runs nn.LSTM over all 16000 samples of each 1-s clip
(ref: py/main14.py:100,115) — the SURVEY.md "hard part".  The lax.scan
implementation (awm_tpu.ops.lstm) hoists the input projection into one big
matmul, but that materializes a (B, T, 4H) fp32 intermediate in HBM — 8.4 GB
at B=512 — and pays per-step fusion overhead across 16000 iterations.

This kernel instead:
- works TIME-MAJOR: the caller transposes to (T, B, D) once so every
  sequential-step slice is a cheap leading-axis index;
- tiles time into TC-step blocks; Pallas streams x blocks HBM->VMEM with
  automatic double-buffering across the (sequential on TPU) grid;
- computes the input projection for the whole tile as one MXU matmul
  ((TC*B, D) @ (D, 4H)) staged in VMEM — the 8 GB intermediate never exists;
- keeps the recurrent state (h, c) and both weight matrices resident in
  VMEM scratch across grid steps, so each timestep is one small MXU matmul
  plus VPU gate math with no HBM traffic;
- writes the (TC, B, H) hidden-state tile back, overlapping with the next
  block's DMA.

Precision follows the ambient policy via the INPUT dtype:
- fp32 x: all matmuls fp32, gate math fp32 — bit-identical to the scan path
  (max err 0.0 in tests/test_pallas.py).  The strict-parity path.
- bf16 x (mixed-precision training/inference): matmul INPUTS are bf16 (the
  MXU's native format — an fp32 matmul on TPU costs 3 bf16 passes), all
  accumulation/state/gate nonlinearities stay fp32, and the y stream is
  stored bf16 (halving its HBM traffic).  The backward recomputes gates
  from the SAME bf16 h values the forward multiplied, so the weight
  gradients are the true gradients of the bf16-forward computation.

Training uses jax.custom_vjp with a Pallas BACKWARD kernel as well.
Residuals are just (x, y, c_prev): h_prev is NOT stored — it is y shifted
by one step, so the backward reads y at t-1 (plus a one-row block of the
neighboring tile) instead of carrying a third (T, B, H) HBM tensor.  The
backward runs the grid in reverse time, hoists the tile's input projection
into one MXU matmul (symmetric with the forward), recomputes gates per step
(cheaper than storing the (T, B, 4H) gate tensor), and reduces ALL weight
gradients to three tile-level MXU matmuls with VMEM accumulators.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the projected-gates tile (fp32 bytes).  Larger budget ->
# longer time tiles -> fewer grid steps, so the (sequential) grid's per-step
# DMA-sync overhead is amortized over more timesteps.  At B=512 the default
# 4 MB gives an 8-step tile (2000 grid steps for T=16000).  Env-tunable.
_XP_TILE_BUDGET = int(os.environ.get("AWM_LSTM_TILE_MB", "4")) * 1024 * 1024

# Sequential-step loop unroll.  Mosaic supports only unroll=1 or FULL unroll
# of the tile's inner loop (unroll == num_steps).  Full unroll removes the
# Mosaic loop's fixed per-iteration overhead from the 16000-step recurrence:
# measured +10% embed+detect (5253 vs 4786 clips/s @ B=512) and +5% train
# (923 vs 880 @ B=128) on v5e, so it is the DEFAULT; AWM_LSTM_UNROLL=1
# restores the rolled loop (faster compile, e.g. for interpret-mode debug).
_raw_unroll = os.environ.get("AWM_LSTM_UNROLL", "full")
_UNROLL = 1 << 30 if _raw_unroll == "full" else max(1, int(_raw_unroll))


def _loop_unroll(tc: int) -> int:
    """Mosaic-legal unroll factor for a tc-step inner loop."""
    return tc if _UNROLL > 1 else 1


def _pick_tc(b: int, t: int, hidden: int, budget: int | None = None) -> int:
    """Largest power-of-two time-tile whose projected-gates buffer fits the
    VMEM budget and divides T."""
    budget = _XP_TILE_BUDGET if budget is None else budget
    tc = 128
    while tc > 8 and (b * tc * 4 * hidden * 4 > budget or t % tc):
        tc //= 2
    while t % tc and tc > 1:
        tc //= 2
    return max(tc, 1)


def _mm_dtype(x_dtype) -> jnp.dtype:
    """Matmul input dtype: bf16 stays bf16 (native MXU), everything else
    runs fp32 (the bit-exact parity path)."""
    return jnp.bfloat16 if x_dtype == jnp.bfloat16 else jnp.float32


def _gate_slices(gates, hidden):
    i = jax.nn.sigmoid(gates[:, 0 * hidden : 1 * hidden])
    f = jax.nn.sigmoid(gates[:, 1 * hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden : 4 * hidden])
    return i, f, g, o


def _lstm_kernel(x_ref, w_ih_ref, w_hh_ref, b_ref, y_ref, h_ref, c_ref, xp_ref):
    """One time-tile: project inputs, then run TC sequential cell updates.

    x_ref: (TC, B, D) VMEM block (mm dtype); w_ih: (D, 4H); w_hh: (H, 4H);
    b: (1, 4H) fp32; y_ref: (TC, B, H) output block; h_ref/c_ref: (B, H)
    fp32 persistent scratch; xp_ref: (TC, B, 4H) fp32 staging for the tile's
    projected gates.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    tc, bsz, d = x_ref.shape
    hidden = h_ref.shape[-1]
    mm = w_hh_ref.dtype

    # Input projection for the whole tile: one MXU matmul.  Time-major rows
    # mean xp_ref[t] below is a contiguous leading-axis slice.
    xp_ref[:] = (
        jnp.dot(
            x_ref[:].reshape(tc * bsz, d),
            w_ih_ref[:],
            preferred_element_type=jnp.float32,
        )
        + b_ref[:]
    ).reshape(tc, bsz, 4 * hidden)

    def body(t, carry):
        h, c = carry
        gates = xp_ref[t] + jnp.dot(
            h.astype(mm), w_hh_ref[:], preferred_element_type=jnp.float32
        )
        i, f, g, o = _gate_slices(gates, hidden)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        y_ref[t] = h.astype(y_ref.dtype)
        return (h, c)

    h, c = jax.lax.fori_loop(0, tc, body, (h_ref[:], c_ref[:]), unroll=_loop_unroll(tc))
    h_ref[:] = h
    c_ref[:] = c


def lstm_pallas_forward(
    x: jnp.ndarray, w_ih: jnp.ndarray, w_hh: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """(B, T, D) -> (B, T, H), zero initial state, torch param layout
    (w_ih: (4H, D), w_hh: (4H, H), b: (4H,))."""
    bsz, t, d = x.shape
    hidden = w_hh.shape[1]
    tc = _pick_tc(bsz, t, hidden)
    grid = (t // tc,)
    mm = _mm_dtype(x.dtype)
    y_dtype = mm if mm == jnp.bfloat16 else jnp.float32

    y_t = pl.pallas_call(
        _lstm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tc, bsz, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_ih^T (D, 4H)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh^T (H, 4H)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b (1, 4H)
        ],
        out_specs=pl.BlockSpec(
            (tc, bsz, hidden), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, bsz, hidden), y_dtype),
        scratch_shapes=[
            pltpu.VMEM((bsz, hidden), jnp.float32),
            pltpu.VMEM((bsz, hidden), jnp.float32),
            pltpu.VMEM((tc, bsz, 4 * hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        jnp.swapaxes(x, 0, 1).astype(mm),
        w_ih.T.astype(mm),
        w_hh.T.astype(mm),
        b.reshape(1, -1).astype(jnp.float32),
    )
    return jnp.swapaxes(y_t, 0, 1).astype(x.dtype)


def _lstm_train_kernel(
    x_ref, w_ih_ref, w_hh_ref, b_ref, y_ref, cprev_ref, h_ref, c_ref, xp_ref
):
    """Forward variant that also streams out the pre-step cell states
    c_{t-1}.  (h_{t-1} needs no stream of its own: it IS y shifted by one
    step, reconstructed by the backward.)"""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    tc, bsz, d = x_ref.shape
    hidden = h_ref.shape[-1]
    mm = w_hh_ref.dtype
    xp_ref[:] = (
        jnp.dot(
            x_ref[:].reshape(tc * bsz, d),
            w_ih_ref[:],
            preferred_element_type=jnp.float32,
        )
        + b_ref[:]
    ).reshape(tc, bsz, 4 * hidden)

    def body(t, carry):
        h, c = carry
        cprev_ref[t] = c
        gates = xp_ref[t] + jnp.dot(
            h.astype(mm), w_hh_ref[:], preferred_element_type=jnp.float32
        )
        i, f, g, o = _gate_slices(gates, hidden)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        y_ref[t] = h.astype(y_ref.dtype)
        return (h, c)

    h, c = jax.lax.fori_loop(0, tc, body, (h_ref[:], c_ref[:]), unroll=_loop_unroll(tc))
    h_ref[:] = h
    c_ref[:] = c


def _lstm_bwd_kernel(
    x_ref, y_ref, yprev_ref, cprev_ref, dy_ref, w_ih_ref, w_hh_ref, b_ref,
    dx_ref, dwih_ref, dwhh_ref, db_ref,
    dh_ref, dc_ref, da_ref, xp_ref, hprev_ref, dwih_acc, dwhh_acc, db_acc,
):
    """Reverse-time backward tile.

    h_{t-1} is reconstructed from the y stream (y[t-1] within the tile; the
    last row of the neighboring earlier-time tile via yprev_ref at a tile
    boundary; zeros at t=0 global).  The tile's input projection is hoisted
    into one MXU matmul (xp scratch, symmetric with the forward); per step:
    recompute gates, gate gradients on the VPU, and the recurrent grad
    dh_{t-1} = da @ W_hh^T.  ALL weight gradients reduce to three
    tile-level MXU matmuls with fp32 VMEM accumulators, flushed on the
    final grid step.
    """
    step = pl.program_id(0)
    nt = pl.num_programs(0)
    tc, bsz, d = x_ref.shape
    hidden = dh_ref.shape[-1]
    mm = w_hh_ref.dtype

    @pl.when(step == 0)
    def _init():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dwih_acc[:] = jnp.zeros_like(dwih_acc)
        dwhh_acc[:] = jnp.zeros_like(dwhh_acc)
        db_acc[:] = jnp.zeros_like(db_acc)

    xp_ref[:] = (
        jnp.dot(
            x_ref[:].reshape(tc * bsz, d),
            w_ih_ref[:],
            preferred_element_type=jnp.float32,
        )
        + b_ref[:]
    ).reshape(tc, bsz, 4 * hidden)

    # reversed grid: the LAST program (step == nt-1) owns the FIRST time
    # tile, whose h_{-1} is the zero initial state
    first_hprev = jnp.where(
        step == nt - 1, jnp.zeros_like(yprev_ref[0]), yprev_ref[0]
    )

    def body(k, carry):
        t = tc - 1 - k  # reverse within the tile
        dh, dc = carry
        hprev = jnp.where(t == 0, first_hprev, y_ref[jnp.maximum(t - 1, 0)])
        hprev_ref[t] = hprev
        cprev = cprev_ref[t]
        gates = xp_ref[t] + jnp.dot(
            hprev, w_hh_ref[:], preferred_element_type=jnp.float32
        )
        i, f, g, o = _gate_slices(gates, hidden)
        c_t = f * cprev + i * g
        tanh_c = jnp.tanh(c_t)

        dh_total = dy_ref[t] + dh
        da_o = dh_total * tanh_c * o * (1.0 - o)
        dc_total = dc + dh_total * o * (1.0 - tanh_c * tanh_c)
        da_i = dc_total * g * i * (1.0 - i)
        da_f = dc_total * cprev * f * (1.0 - f)
        da_g = dc_total * i * (1.0 - g * g)
        da = jnp.concatenate([da_i, da_f, da_g, da_o], axis=-1)  # (B, 4H)
        da_ref[t] = da

        dh_prev = jnp.dot(
            da.astype(mm), w_hh_ref[:].T, preferred_element_type=jnp.float32
        )  # (B, H)
        dc_prev = dc_total * f
        return (dh_prev, dc_prev)

    dh, dc = jax.lax.fori_loop(0, tc, body, (dh_ref[:], dc_ref[:]), unroll=_loop_unroll(tc))
    dh_ref[:] = dh
    dc_ref[:] = dc

    da_flat = da_ref[:].reshape(tc * bsz, 4 * hidden)
    da_mm = da_flat.astype(mm)
    dx_ref[:] = (
        jnp.dot(da_mm, w_ih_ref[:].T, preferred_element_type=jnp.float32)
        .reshape(tc, bsz, d)
        .astype(dx_ref.dtype)
    )
    dwih_acc[:] += jnp.dot(
        x_ref[:].reshape(tc * bsz, d).T, da_mm, preferred_element_type=jnp.float32
    )
    dwhh_acc[:] += jnp.dot(
        hprev_ref[:].reshape(tc * bsz, hidden).T,
        da_mm,
        preferred_element_type=jnp.float32,
    )
    db_acc[:] += jnp.sum(da_flat, axis=0, keepdims=True)

    @pl.when(step == nt - 1)
    def _flush():
        dwih_ref[:] = dwih_acc[:]
        dwhh_ref[:] = dwhh_acc[:]
        db_ref[:] = db_acc[:]


def _forward_train(x, w_ih, w_hh, b):
    """Time-major forward returning (y (T,B,H) in x.dtype, cprev_hist
    (T,B,H) fp32)."""
    bsz, t, d = x.shape
    hidden = w_hh.shape[1]
    tc = _pick_tc(bsz, t, hidden)
    grid = (t // tc,)
    mm = _mm_dtype(x.dtype)
    y_dtype = mm if mm == jnp.bfloat16 else jnp.float32
    blk = lambda feat: pl.BlockSpec(
        (tc, bsz, feat), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    y, cprev = pl.pallas_call(
        _lstm_train_kernel,
        grid=grid,
        in_specs=[
            blk(d),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(blk(hidden), blk(hidden)),
        out_shape=(
            jax.ShapeDtypeStruct((t, bsz, hidden), y_dtype),
            jax.ShapeDtypeStruct((t, bsz, hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bsz, hidden), jnp.float32),
            pltpu.VMEM((bsz, hidden), jnp.float32),
            pltpu.VMEM((tc, bsz, 4 * hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(
        jnp.swapaxes(x, 0, 1).astype(mm),
        w_ih.T.astype(mm),
        w_hh.T.astype(mm),
        b.reshape(1, -1).astype(jnp.float32),
    )
    return y, cprev


def _backward(x_t, y_t, cprev, dy_t, w_ih, w_hh, b, dx_dtype):
    """Time-major backward.  Returns (dx (T,B,D) in dx_dtype, dw_ih (4H,D),
    dw_hh (4H,H), db (4H,) — weight grads fp32)."""
    t, bsz, d = x_t.shape
    hidden = w_hh.shape[1]
    tc = _pick_tc(bsz, t, hidden)
    nt = t // tc
    mm = _mm_dtype(x_t.dtype)
    rev = lambda feat: pl.BlockSpec(
        (tc, bsz, feat), lambda i: (nt - 1 - i, 0, 0), memory_space=pltpu.VMEM
    )
    # one-row block: the last y row of the earlier-time neighbor tile
    # (h_{t0-1} for this tile's first step); clamped at the global edge,
    # where the kernel masks it with zeros
    yprev = pl.BlockSpec(
        (1, bsz, hidden),
        lambda i: (jnp.maximum((nt - 1 - i) * tc - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    dx, dwih_t, dwhh_t, db = pl.pallas_call(
        _lstm_bwd_kernel,
        grid=(nt,),
        in_specs=[rev(d), rev(hidden), yprev, rev(hidden), rev(hidden), full, full, full],
        out_specs=(
            rev(d),
            pl.BlockSpec((d, 4 * hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 4 * hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, bsz, d), dx_dtype),
            jax.ShapeDtypeStruct((d, 4 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden, 4 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bsz, hidden), jnp.float32),
            pltpu.VMEM((bsz, hidden), jnp.float32),
            pltpu.VMEM((tc, bsz, 4 * hidden), jnp.float32),
            pltpu.VMEM((tc, bsz, 4 * hidden), jnp.float32),
            pltpu.VMEM((tc, bsz, hidden), mm),
            pltpu.VMEM((d, 4 * hidden), jnp.float32),
            pltpu.VMEM((hidden, 4 * hidden), jnp.float32),
            pltpu.VMEM((1, 4 * hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(
        x_t,
        y_t,
        y_t,  # same tensor, different (one-row, shifted) block spec
        cprev,
        dy_t,
        w_ih.T.astype(mm),
        w_hh.T.astype(mm),
        b.reshape(1, -1).astype(jnp.float32),
    )
    # kernel computes grads w.r.t. the TRANSPOSED weights it was fed
    return dx, dwih_t.T, dwhh_t.T, db.reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def lstm_fused(x, w_ih, w_hh, b):
    """Drop-in LSTM: Pallas forward and backward kernels (see module doc)."""
    return lstm_pallas_forward(x, w_ih, w_hh, b)


def _fused_fwd(x, w_ih, w_hh, b):
    y_t, cprev = _forward_train(x, w_ih, w_hh, b)
    out = jnp.swapaxes(y_t, 0, 1).astype(x.dtype)
    # residuals: x in its ORIGINAL dtype (half the bytes under bf16), the
    # y stream (doubles as h_{t-1} history), and the c_{t-1} history
    return out, (x, y_t, cprev, w_ih, w_hh, b)


def _fused_bwd(residuals, g):
    x, y_t, cprev, w_ih, w_hh, b = residuals
    mm = _mm_dtype(x.dtype)
    x_t = jnp.swapaxes(x, 0, 1).astype(mm)
    dy_t = jnp.swapaxes(g, 0, 1).astype(jnp.float32)
    dx_t, dw_ih, dw_hh, db = _backward(
        x_t, y_t, cprev, dy_t, w_ih, w_hh, b, dx_dtype=x.dtype
    )
    # cotangents must match the primal dtypes (custom_vjp checks), e.g.
    # bf16 activations with fp32 params under mixed-precision training
    return (
        jnp.swapaxes(dx_t, 0, 1),
        dw_ih.astype(w_ih.dtype),
        dw_hh.astype(w_hh.dtype),
        db.astype(b.dtype),
    )


lstm_fused.defvjp(_fused_fwd, _fused_bwd)


def lstm_fused_auto(x, w_ih, w_hh, b, *, data_axis: str = "data"):
    """lstm_fused, made multi-chip-safe.

    A pallas_call is an opaque custom call to GSPMD: under plain jit on a
    mesh it forces an all-gather of the batch and runs replicated on every
    chip.  When a mesh context is active (jax.sharding.set_mesh — the
    trainer and dryrun install it), wrap the kernel in shard_map over the
    data axis so each chip runs the kernel on its own batch shard; weights
    stay replicated and shard_map's transpose inserts the gradient psum
    over ICI automatically.  Without a mesh context (single chip) this is
    exactly lstm_fused.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if (
        mesh is None
        or mesh.empty
        or data_axis not in mesh.axis_names
        or mesh.shape[data_axis] == 1
        or x.shape[0] % mesh.shape[data_axis]
    ):
        return lstm_fused(x, w_ih, w_hh, b)
    from jax.sharding import PartitionSpec as P

    f = jax.shard_map(
        lstm_fused,
        in_specs=(P(data_axis, None, None), P(), P(), P()),
        out_specs=P(data_axis, None, None),
        check_vma=False,  # pallas out_shapes carry no vma; grads verified
    )
    return f(x, w_ih, w_hh, b)
