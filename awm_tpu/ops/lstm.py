"""LSTM with cuDNN/torch-compatible gate math, structured for TPU.

The reference generators run an nn.LSTM over all 16000 samples of a 1-s clip
(ref: py/main14.py:100,115; two layers in py/main14b_2.py:147).  That is the
latency-dominant op (SURVEY.md "hard parts").  TPU-native treatment:

1. The input projection for ALL timesteps is hoisted out of the recurrence
   into one large (B*T, D) @ (D, 4H) matmul — MXU work, bandwidth-friendly.
2. The remaining recurrence (h @ W_hh + gate nonlinearities) runs under
   ``lax.scan`` with an unroll factor so XLA amortizes loop overhead; a
   fused Pallas kernel that keeps (h, c) and W_hh resident in VMEM is the
   drop-in upgrade path (awm_tpu.ops.pallas).
3. Gate order is torch's (i, f, g, o) and the two torch biases are summed
   into one, so reference .pth checkpoints import losslessly
   (b = b_ih + b_hh; they only ever appear added together).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def lstm_cell(
    xp_t: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray, w_hh: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One step.  xp_t: (B, 4H) pre-projected input (+bias already added),
    w_hh: (4H, H) torch layout.  Returns (h', c')."""
    gates = xp_t + jnp.matmul(h, w_hh.T, preferred_element_type=jnp.float32)
    hdim = h.shape[-1]
    i = jax.nn.sigmoid(gates[..., 0 * hdim : 1 * hdim])
    f = jax.nn.sigmoid(gates[..., 1 * hdim : 2 * hdim])
    g = jnp.tanh(gates[..., 2 * hdim : 3 * hdim])
    o = jax.nn.sigmoid(gates[..., 3 * hdim : 4 * hdim])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_forward(
    x: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    b: jnp.ndarray,
    *,
    unroll: int = 16,
) -> jnp.ndarray:
    """Single-layer LSTM over (B, T, D) -> (B, T, H), zero initial state.

    w_ih: (4H, D), w_hh: (4H, H), b: (4H,) — torch parameter layout with
    b = b_ih + b_hh.
    """
    bsz, t, _ = x.shape
    hdim = w_hh.shape[1]
    # Hoisted input projection: one big MXU matmul over all timesteps.
    xp = (
        jnp.matmul(x, w_ih.T, preferred_element_type=jnp.float32) + b
    )  # (B, T, 4H)
    xs = jnp.moveaxis(xp, 1, 0)  # (T, B, 4H) — scan over leading axis

    h0 = jnp.zeros((bsz, hdim), dtype=xp.dtype)
    c0 = jnp.zeros((bsz, hdim), dtype=xp.dtype)

    def step(carry, xp_t):
        h, c = carry
        h, c = lstm_cell(xp_t, h, c, w_hh)
        return (h, c), h

    (_, _), ys = jax.lax.scan(step, (h0, c0), xs, unroll=unroll)
    return jnp.moveaxis(ys, 0, 1).astype(x.dtype)


def lstm_stack(
    x: jnp.ndarray, layers: Tuple[dict, ...], *, unroll: int = 16
) -> jnp.ndarray:
    """Multi-layer LSTM (main14b_2 uses 2 layers, ref: py/main14b_2.py:147).

    Each layer dict holds {'w_ih', 'w_hh', 'b'}.
    """
    for p in layers:
        x = lstm_forward(x, p["w_ih"], p["w_hh"], p["b"], unroll=unroll)
    return x
