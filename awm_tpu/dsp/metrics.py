"""Signal metrics: SI-SNR, RMS, power ratio, int16 quantization.

Definitions kept numerically identical to the reference so quality numbers
are directly comparable (ref: compute_si_snr py/main14.py:650-659, delta RMS
py/main14.py:774, power ratio py/main14.py:789-791, int16 quantization
main15c.ipynb cell 4 / py/main15.py:850-867).
"""

from __future__ import annotations

import jax.numpy as jnp


def si_snr(s: jnp.ndarray, s_hat: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Scale-invariant SNR in dB over the last axis; mean over leading axes.

    Matches the reference exactly: mean-center, project s_hat onto s, ratio
    of target to residual energy (ref: py/main14.py:650-659).
    """
    s = s - jnp.mean(s, axis=-1, keepdims=True)
    s_hat = s_hat - jnp.mean(s_hat, axis=-1, keepdims=True)
    dot = jnp.sum(s * s_hat, axis=-1, keepdims=True)
    norm_s = jnp.sum(s * s, axis=-1, keepdims=True)
    alpha = dot / (norm_s + eps)
    s_target = alpha * s
    e_noise = s_hat - s_target
    ratio = jnp.sum(s_target * s_target, axis=-1) / (jnp.sum(e_noise * e_noise, axis=-1) + eps)
    return jnp.mean(10.0 * jnp.log10(ratio))


def rms(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Root-mean-square; axis=None reduces everything (file-level RMS)."""
    return jnp.sqrt(jnp.mean(jnp.square(x), axis=axis))


def power_ratio_db(signal: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """10*log10(P_signal / P_delta) (ref: py/main14.py:789-791)."""
    return 10.0 * jnp.log10(jnp.mean(jnp.square(signal)) / jnp.mean(jnp.square(delta)))


def quantize_int16(x: jnp.ndarray) -> jnp.ndarray:
    """Differentiable-adjacent int16 round-trip: round(x*32767)/32767.

    Used inside the main15c robustness fine-tune graph (ref: main15c.ipynb
    cell 4).  Gradient of round() is zero; the fine-tune relies on the
    surrounding terms, same as the reference.
    """
    return jnp.round(x * 32767.0) / 32767.0
