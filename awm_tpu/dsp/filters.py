"""Time-domain filters: windowed-sinc FIR lowpass and biquad IIR lowpass.

TPU-native replacements for the reference's torch filters:

- ``fir_lowpass``: differentiable 101-tap Hamming-windowed sinc LPF applied
  to the watermark delta (ref: py/main16.py:53-64).  A depthwise conv —
  XLA fuses it with the surrounding shaping chain.
- ``lowpass_biquad``: torchaudio.functional.lowpass_biquad equivalent
  (ref: main15c.ipynb cell 4; py/main15.py:850-867).  A 2nd-order IIR is
  inherently sequential; instead of a 16000-step ``lax.scan`` we express the
  recurrence in state-space form and evaluate it with
  ``jax.lax.associative_scan`` over 2x2 transition matrices — log-depth on
  TPU and fully differentiable, so it can sit inside the training graph for
  the main15c robustness fine-tune.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def sinc_lowpass_kernel(cutoff_hz: float, taps: int, sample_rate: int) -> np.ndarray:
    """Hamming-windowed sinc FIR kernel, unit DC gain, shape (taps,).

    Ideal lowpass h[n] = sin(2*pi*fc*n)/(pi*n) with fc = cutoff/sr in
    cycles/sample (2*fc at n=0), Hamming window, normalized to sum 1.

    NOTE — deliberate divergence from the reference: py/main16.py:58 sets
    fc = cutoff/(sr/2) and then still uses sin(2*pi*fc*n), double-normalizing
    the cutoff.  At cutoff=4 kHz, sr=16 kHz that makes sin(pi*n) == 0 for
    every integer tap, i.e. the reference's "FIR lowpass" degenerates to an
    identity filter.  This build implements the filter main16 intended
    (verified against scipy.signal.firwin in tests/test_dsp.py).
    """
    fc = cutoff_hz / sample_rate
    n = np.arange(taps, dtype=np.float64) - (taps - 1) / 2.0
    with np.errstate(divide="ignore", invalid="ignore"):
        sinc = np.where(n == 0, 2.0 * fc, np.sin(2.0 * math.pi * fc * n) / (math.pi * n))
    window = 0.54 - 0.46 * np.cos(2.0 * math.pi * (n + (taps - 1) / 2.0) / (taps - 1))
    kernel = sinc * window
    return (kernel / kernel.sum()).astype(np.float32)


def fir_lowpass(
    x: jnp.ndarray,
    cutoff_hz: float = 4000.0,
    taps: int = 101,
    sample_rate: int = 16000,
) -> jnp.ndarray:
    """Zero-phase-delay FIR lowpass of (..., T), 'same' output length.

    Equivalent to the reference's F.conv1d(delta, kernel, padding=(taps-1)//2)
    (ref: py/main16.py:62-64).  Implemented as a 1-D convolution with a
    constant kernel; XLA lowers it to an MXU-friendly matmul.
    """
    kernel = jnp.asarray(sinc_lowpass_kernel(cutoff_hz, taps, sample_rate))
    lead = x.shape[:-1]
    t = x.shape[-1]
    xf = x.reshape((-1, 1, t))
    # torch conv1d cross-correlates; the kernel is symmetric so flip is moot,
    # but keep correlation semantics for exactness.
    out = jax.lax.conv_general_dilated(
        xf.astype(jnp.float32),
        kernel.reshape(1, 1, taps),
        window_strides=(1,),
        padding=[((taps - 1) // 2, (taps - 1) // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(lead + (t,)).astype(x.dtype)


def lowpass_biquad_coeffs(cutoff_hz: float, sample_rate: int, q: float = 0.707) -> tuple:
    """Normalized (b0, b1, b2, a1, a2) for a 2nd-order Butterworth-style LPF.

    Identical formula to torchaudio.functional.lowpass_biquad (audio EQ
    cookbook): w0 = 2*pi*fc/sr, alpha = sin(w0)/(2Q).
    """
    w0 = 2.0 * math.pi * cutoff_hz / sample_rate
    alpha = math.sin(w0) / (2.0 * q)
    cw = math.cos(w0)
    b0 = (1.0 - cw) / 2.0
    b1 = 1.0 - cw
    b2 = (1.0 - cw) / 2.0
    a0 = 1.0 + alpha
    a1 = -2.0 * cw
    a2 = 1.0 - alpha
    return (b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0)


def _biquad_associative(x: jnp.ndarray, coeffs) -> jnp.ndarray:
    """Apply one biquad along the last axis via parallel (associative) scan.

    Direct-form-II-transposed state space:
        y[n]  = b0*x[n] + s1[n-1]
        s1[n] = b1*x[n] - a1*y[n] + s2[n-1]
        s2[n] = b2*x[n] - a2*y[n]
    Substituting y gives a linear recurrence  s[n] = A s[n-1] + B x[n]  with
        A = [[-a1, 1], [-a2, 0]],  B = [[b1 - a1*b0], [b2 - a2*b0]]
    which composes associatively: (A2, v2) o (A1, v1) = (A2 A1, A2 v1 + v2).
    ``associative_scan`` evaluates all 16000 steps in O(log T) depth — the
    TPU-native answer to an IIR that the reference runs as a cuDNN loop.
    """
    b0, b1, b2, a1, a2 = coeffs
    lead = x.shape[:-1]
    t_orig = x.shape[-1]
    # associative_scan recurses by halving; non-power-of-two lengths explode
    # XLA compile time.  The filter is causal, so zero-padding the tail is
    # free: pad to the next power of two, trim after.
    t = 1 << (t_orig - 1).bit_length()
    xf = x.reshape((-1, t_orig)).astype(jnp.float32)
    if t != t_orig:
        xf = jnp.pad(xf, ((0, 0), (0, t - t_orig)))

    # Elements per step n: (A, B*x[n]) carried as six scalar sequences so the
    # combine is pure fp32 VPU elementwise math (a 2x2-matmul formulation
    # would route through the MXU at bf16 precision and bloat compile time).
    f32 = jnp.float32
    bsz = xf.shape[0]
    ones = jnp.ones((bsz, t), f32)
    a00 = ones * f32(-a1)
    a01 = ones * f32(1.0)
    a10 = ones * f32(-a2)
    a11 = ones * f32(0.0)
    v0 = xf * f32(b1 - a1 * b0)  # (batch, T)
    v1 = xf * f32(b2 - a2 * b0)

    def comb(left, right):
        l00, l01, l10, l11, lv0, lv1 = left
        r00, r01, r10, r11, rv0, rv1 = right
        # A = A_r @ A_l ; v = A_r @ v_l + v_r   (broadcast (T,) over (B, T))
        return (
            r00 * l00 + r01 * l10,
            r00 * l01 + r01 * l11,
            r10 * l00 + r11 * l10,
            r10 * l01 + r11 * l11,
            r00 * lv0 + r01 * lv1 + rv0,
            r10 * lv0 + r11 * lv1 + rv1,
        )

    out = jax.lax.associative_scan(
        comb, (a00, a01, a10, a11, v0, v1), axis=-1
    )
    s1 = out[4]  # (batch, T): state component 1 AFTER step n
    # y[n] = b0*x[n] + s1[n-1]; s1[-1] = 0.
    s1_prev = jnp.concatenate([jnp.zeros_like(s1[:, :1]), s1[:, :-1]], axis=1)
    y = (b0 * xf + s1_prev)[:, :t_orig]
    return y.reshape(lead + (t_orig,)).astype(x.dtype)


def _biquad_impulse_response(coeffs, tol: float = 1e-7, max_len: int = 8192) -> np.ndarray:
    """Truncated impulse response of the biquad, computed on host.

    A stable 2nd-order IIR decays geometrically with the pole magnitude; once
    |h| < tol the remaining taps are below fp32 signal resolution.  For the
    reference's 7 kHz @ 16 kHz lowpass the poles sit at |p| ~ 0.45 so ~40
    taps suffice.
    """
    b0, b1, b2, a1, a2 = coeffs
    h = np.zeros(max_len, dtype=np.float64)
    x1 = x2 = y1 = y2 = 0.0
    for n in range(max_len):
        xn = 1.0 if n == 0 else 0.0
        yn = b0 * xn + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
        h[n] = yn
        x2, x1 = x1, xn
        y2, y1 = y1, yn
        if n > 2 and abs(yn) < tol and abs(y1) < tol and abs(y2) < tol:
            h = h[: n + 1]
            break
    return h.astype(np.float32)


def biquad(x: jnp.ndarray, coeffs) -> jnp.ndarray:
    """Apply one biquad along the last axis, TPU-native.

    Strategy: if the impulse response truncates quickly (well-damped poles —
    true for every filter the reference uses), evaluate it as a short causal
    FIR convolution (one fused conv, exact to fp32, cheap on the MXU).
    Otherwise fall back to the log-depth associative scan.  Both paths are
    differentiable, so this can sit inside the main15c fine-tune graph.
    """
    h = _biquad_impulse_response(coeffs)
    if len(h) >= 8192:
        return _biquad_associative(x, coeffs)
    taps = len(h)
    lead = x.shape[:-1]
    t = x.shape[-1]
    xf = x.reshape((-1, 1, t)).astype(jnp.float32)
    # causal: pad (taps-1) on the left only; correlate with reversed h.
    out = jax.lax.conv_general_dilated(
        xf,
        jnp.asarray(h[::-1].copy()).reshape(1, 1, taps),
        window_strides=(1,),
        padding=[(taps - 1, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(lead + (t,)).astype(x.dtype)


def lowpass_biquad(
    x: jnp.ndarray,
    sample_rate: int = 16000,
    cutoff_freq: float = 7000.0,
    q: float = 0.707,
) -> jnp.ndarray:
    """torchaudio.functional.lowpass_biquad equivalent over the last axis."""
    return biquad(x, lowpass_biquad_coeffs(cutoff_freq, sample_rate, q))
