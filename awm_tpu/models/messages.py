"""16-bit message pack/unpack with the reference's exact bit convention.

Bit order is LSB-first: bit i of integer msg is (msg & (1 << i)) > 0
(ref: py/main14.py:220-221).  Decode rule on detector logits: threshold the
time-mean logit at 0 (ref: py/main14.py:925-929); the per-timestep
majority-vote variant used by evaluate_model thresholds sigmoid>0.5 per step,
averages over time, then thresholds at 0.5 (ref: py/main14.py:314-317).
"""

from __future__ import annotations

import jax.numpy as jnp


def message_to_bits(message: jnp.ndarray, bits: int = 16) -> jnp.ndarray:
    """(...,) int message -> (..., bits) float {0,1}, LSB first."""
    shifts = jnp.arange(bits, dtype=message.dtype)
    return ((message[..., None] >> shifts) & 1).astype(jnp.float32)


def bits_to_message(bit_arr: jnp.ndarray) -> jnp.ndarray:
    """(..., bits) {0,1} -> (...,) integer message, LSB first."""
    bits = bit_arr.shape[-1]
    weights = (1 << jnp.arange(bits, dtype=jnp.int32)).astype(jnp.int32)
    return jnp.sum(bit_arr.astype(jnp.int32) * weights, axis=-1)


def decode_bits_mean_logit(decode_logits: jnp.ndarray) -> jnp.ndarray:
    """(B, T, bits) logits -> (B, bits) {0,1} via time-mean logit > 0
    (the detect_watermark rule, ref: py/main14.py:925-927)."""
    return (decode_logits.mean(axis=-2) > 0).astype(jnp.float32)


def decode_bits_majority(decode_logits: jnp.ndarray) -> jnp.ndarray:
    """(B, T, bits) logits -> (B, bits) {0,1} via per-step vote then time
    majority (the evaluate_model rule, ref: py/main14.py:314-317)."""
    votes = (jnp.asarray(decode_logits) > 0).astype(jnp.float32)  # sigmoid>0.5
    return (votes.mean(axis=-2) > 0.5).astype(jnp.float32)
