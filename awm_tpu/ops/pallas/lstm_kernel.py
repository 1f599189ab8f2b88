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

Gate math is torch/cuDNN order (i, f, g, o) in fp32 — bit-identical to the
scan path (max err 0.0 in tests/test_pallas.py).

Training uses jax.custom_vjp: forward runs this kernel, backward replays the
differentiable scan implementation (same cost as before — the kernel
accelerates the inference-heavy paths: embed/detect serving and benchmarks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the projected-gates tile (fp32 bytes)
_XP_TILE_BUDGET = 4 * 1024 * 1024


def _pick_tc(b: int, t: int, hidden: int) -> int:
    """Largest power-of-two time-tile whose projected-gates buffer fits the
    VMEM budget and divides T."""
    tc = 128
    while tc > 8 and (b * tc * 4 * hidden * 4 > _XP_TILE_BUDGET or t % tc):
        tc //= 2
    while t % tc and tc > 1:
        tc //= 2
    return max(tc, 1)


def _lstm_kernel(x_ref, w_ih_ref, w_hh_ref, b_ref, y_ref, h_ref, c_ref, xp_ref):
    """One time-tile: project inputs, then run TC sequential cell updates.

    x_ref: (TC, B, D) VMEM block; w_ih: (D, 4H); w_hh: (H, 4H); b: (1, 4H);
    y_ref: (TC, B, H) output block; h_ref/c_ref: (B, H) persistent scratch;
    xp_ref: (TC, B, 4H) staging for the tile's projected gates.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    tc, bsz, d = x_ref.shape
    hidden = h_ref.shape[-1]

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
            h, w_hh_ref[:], preferred_element_type=jnp.float32
        )
        i = jax.nn.sigmoid(gates[:, 0 * hidden : 1 * hidden])
        f = jax.nn.sigmoid(gates[:, 1 * hidden : 2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden : 4 * hidden])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        y_ref[t] = h
        return (h, c)

    h, c = jax.lax.fori_loop(0, tc, body, (h_ref[:], c_ref[:]))
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
        out_shape=jax.ShapeDtypeStruct((t, bsz, hidden), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bsz, hidden), jnp.float32),
            pltpu.VMEM((bsz, hidden), jnp.float32),
            pltpu.VMEM((tc, bsz, 4 * hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        jnp.swapaxes(x, 0, 1).astype(jnp.float32),
        w_ih.T.astype(jnp.float32),
        w_hh.T.astype(jnp.float32),
        b.reshape(1, -1).astype(jnp.float32),
    )
    return jnp.swapaxes(y_t, 0, 1).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def lstm_fused(x, w_ih, w_hh, b):
    """Drop-in LSTM: Pallas forward, scan-based backward."""
    return lstm_pallas_forward(x, w_ih, w_hh, b)


def _fused_fwd(x, w_ih, w_hh, b):
    return lstm_pallas_forward(x, w_ih, w_hh, b), (x, w_ih, w_hh, b)


def _fused_bwd(residuals, g):
    from awm_tpu.ops.lstm import lstm_forward

    x, w_ih, w_hh, b = residuals
    _, vjp = jax.vjp(lambda *a: lstm_forward(*a), x, w_ih, w_hh, b)
    return vjp(g)


lstm_fused.defvjp(_fused_fwd, _fused_bwd)
