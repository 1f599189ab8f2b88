"""Rational polyphase resampling, TPU-native.

The reference's file I/O path resamples arbitrary sample-rate ratios with
torchaudio's Kaiser-windowed polyphase Resample (ref: py/main14.py:726-727),
so real-world attack channels include non-integer round trips such as
16 kHz -> 22.05 kHz -> 16 kHz (up/down = 441/320).  Round 2 only supported
integer decimation; this module closes that gap (VERDICT round-2 item 5).

TPU-native formulation: instead of materializing the zero-stuffed upsampled
signal (length T*up — gigabytes at batch size) or running `up` separate
small FIRs, the polyphase decomposition is packed into ONE multi-channel
strided convolution:

    y[n*up + r] = sum_q  W[r, q] * x[n*down + q_min + q]

where W[r, :] is phase r of the prototype lowpass embedded at its own
offset.  One conv with `up` output channels, kernel width ~(down +
2*taps_per_phase + 2), stride `down` — shapes are static, the op lowers to
an MXU matmul, and it is differentiable end-to-end so it can sit inside the
robustness-training graph (awm_tpu.augment).

The prototype filter matches scipy.signal.resample_poly's default
(firwin(2*10*max(up,down)+1, 1/max(up,down), window=('kaiser', 5.0)),
scaled by `up`); tests/test_dsp.py holds a golden comparison against scipy.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _firwin_kaiser(numtaps: int, cutoff: float, beta: float = 5.0) -> np.ndarray:
    """scipy.signal.firwin(numtaps, cutoff, window=('kaiser', beta)) clone.

    cutoff is in Nyquist units (1.0 = fs/2).  Windowed-sinc lowpass,
    normalized to unit DC gain (firwin's scale=True for a lowpass).
    """
    m = np.arange(numtaps, dtype=np.float64) - (numtaps - 1) / 2.0
    h = cutoff * np.sinc(cutoff * m)  # np.sinc is sin(pi x)/(pi x)
    h *= np.kaiser(numtaps, beta)
    return h / h.sum()


@lru_cache(maxsize=64)
def _polyphase_weights(up: int, down: int, taps_per_phase: int = 10,
                       beta: float = 5.0):
    """Host-side construction of the packed polyphase weight matrix.

    Returns (W, q_min) with W shape (up, width) float32 such that
    y[n*up + r] = sum_q W[r, q] * x[n*down + q_min + q], where x is indexed
    on the ORIGINAL grid (zero outside).  Derivation: with prototype h of
    half-length H = taps_per_phase*max(up,down) centered at H,
    y[j] = sum_m h[m*up - j*down + H] x[m]; substituting j = n*up + r and
    m = n*down + q gives kernel index up*q - r*down + H.
    """
    if up < 1 or down < 1:
        raise ValueError("up/down must be positive integers")
    g = math.gcd(up, down)
    up, down = up // g, down // g
    max_rate = max(up, down)
    half = taps_per_phase * max_rate
    h = _firwin_kaiser(2 * half + 1, 1.0 / max_rate, beta) * up
    n_taps = len(h)

    # q range over all phases r in [0, up): kernel index up*q - r*down + half
    # must land in [0, n_taps)
    q_min = -(half // up)  # r = 0 lower edge
    q_max = ((up - 1) * down + half) // up  # r = up-1 upper edge
    width = q_max - q_min + 1
    W = np.zeros((up, width), dtype=np.float32)
    for r in range(up):
        q = np.arange(q_min, q_max + 1)
        idx = up * q - r * down + half
        ok = (idx >= 0) & (idx < n_taps)
        W[r, ok] = h[idx[ok]]
    return W, q_min, up, down


def resample_poly(x: jnp.ndarray, up: int, down: int, *,
                  taps_per_phase: int = 10, beta: float = 5.0) -> jnp.ndarray:
    """Rational resample of (..., T) by up/down, scipy.resample_poly-parity.

    Output length ceil(T*up/down) (zero-padded edges, centered prototype —
    sample j of the output sits at time j*down/up on the input grid).
    Static shapes; one strided multi-channel conv (see module docstring).
    ref: torchaudio Resample in the reference's I/O path, py/main14.py:726-727.
    """
    W, q_min, up, down = _polyphase_weights(up, down, taps_per_phase, beta)
    if up == 1 and down == 1:
        return x
    lead = x.shape[:-1]
    t = x.shape[-1]
    out_len = -(-t * up // down)  # ceil
    n_blocks = -(-out_len // up)  # conv output positions needed
    width = W.shape[1]

    # x index touched: n*down + q_min + dq for n in [0, n_blocks), dq in [0, width)
    pad_l = max(0, -q_min)
    pad_r = max(0, (n_blocks - 1) * down + q_min + width - 1 - (t - 1))
    xf = x.reshape((-1, 1, t)).astype(jnp.float32)
    xf = jnp.pad(xf, ((0, 0), (0, 0), (pad_l, pad_r)))
    out = jax.lax.conv_general_dilated(
        xf,
        jnp.asarray(W).reshape(up, 1, width),
        window_strides=(down,),
        padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, up, n_blocks)
    y = jnp.swapaxes(out, 1, 2).reshape((xf.shape[0], n_blocks * up))
    return y[:, :out_len].reshape(lead + (out_len,)).astype(x.dtype)


def resample_rational(x: jnp.ndarray, orig_hz: int, target_hz: int,
                      **kw) -> jnp.ndarray:
    """Resample (..., T) audio from orig_hz to target_hz (any integer rates)."""
    g = math.gcd(int(orig_hz), int(target_hz))
    return resample_poly(x, int(target_hz) // g, int(orig_hz) // g, **kw)
