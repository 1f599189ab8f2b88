"""Delta-shaping chain (main16) and channel-simulation postprocess (main15c).

All differentiable, all in-graph — XLA fuses them with the generator output
(the reference applies them eagerly between module calls,
ref: py/main16.py:244-247, main15c.ipynb cell 6).
"""

from __future__ import annotations

import jax.numpy as jnp

from awm_tpu.config import ShapingConfig
from awm_tpu.dsp import fir_lowpass, lowpass_biquad, quantize_int16


def clamp_peak(delta: jnp.ndarray, thr: float = 0.02) -> jnp.ndarray:
    """delta.clamp(-thr, thr) (ref: py/main16.py:66-67)."""
    return jnp.clip(delta, -thr, thr)


def limit_rms(delta: jnp.ndarray, max_rms: float = 0.005, eps: float = 1e-8) -> jnp.ndarray:
    """Per-example differentiable RMS cap: gain = min(max_rms/rms, 1)
    (ref: py/main16.py:69-72).  delta: (B, T); reduction over all but batch."""
    axes = tuple(range(1, delta.ndim))
    cur = jnp.sqrt(jnp.mean(jnp.square(delta), axis=axes, keepdims=True) + eps)
    gain = jnp.minimum(max_rms / cur, 1.0)
    return delta * gain


def shape_delta(delta: jnp.ndarray, cfg: ShapingConfig, sample_rate: int = 16000) -> jnp.ndarray:
    """main16 chain: fir_lowpass -> clamp_peak -> limit_rms
    (ref: py/main16.py:244-247)."""
    if not cfg.enabled:
        return delta
    d = fir_lowpass(delta, cfg.fir_cutoff_hz, cfg.fir_taps, sample_rate)
    d = clamp_peak(d, cfg.clamp_thr)
    return limit_rms(d, cfg.max_rms)


def perceptual_postprocess(
    s_w: jnp.ndarray, cutoff_hz: float = 7000.0, sample_rate: int = 16000
) -> jnp.ndarray:
    """Channel-attack simulation: 7 kHz biquad lowpass + int16 quantization
    round-trip, applied to the watermarked signal inside the training graph
    (ref: main15c.ipynb cell 4)."""
    y = lowpass_biquad(s_w, sample_rate, cutoff_hz)
    return quantize_int16(y)


def apply_channel(s_w: jnp.ndarray, cfg: ShapingConfig, sample_rate: int = 16000) -> jnp.ndarray:
    if not cfg.postprocess:
        return s_w
    return perceptual_postprocess(s_w, cfg.postprocess_cutoff_hz, sample_rate)
