"""Spectral ops: framing, STFT, mel filterbank, log-mel.

TPU-native re-implementation of the torch/torchaudio spectral stack used by
the reference losses (torch.stft in TFLoudnessLoss, ref: py/main14.py:172-175;
torchaudio.transforms.MelSpectrogram in MultiScaleMelLoss, ref:
py/main14.py:156-159; delta STFT in high_freq_penalty, ref:
py/main16.py:74-81).  Conventions matched:

- hann window, periodic (torch.hann_window default)
- center=True with reflect padding of n_fft//2 (torch.stft default)
- onesided rfft, no normalization
- mel: HTK scale, no filterbank norm, f_min=0, f_max=sr/2, power=2.0
  (torchaudio MelSpectrogram defaults)

Everything is a pure function of jnp arrays so XLA can fuse framing, FFT and
the downstream loss reductions into one compiled graph — no host round-trips.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def hann_window(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window, identical to torch.hann_window(n)."""
    k = jnp.arange(n, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * k / n)


def frame(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Slice (..., T) into overlapping frames -> (..., n_frames, frame_length).

    Implemented as a gather with a static index matrix; XLA lowers this to an
    efficient strided copy and can fuse the window multiply that follows.
    """
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :])
    return x[..., idx]


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    *,
    center: bool = True,
    window: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Complex STFT of (..., T) -> (..., n_frames, n_fft//2 + 1).

    Note the reference's (freq, time) torch layout is transposed here —
    (time, freq) keeps the frame axis adjacent to batch so XLA tiles the FFT
    batch onto the VPU cleanly; reductions downstream are layout-agnostic.
    """
    if window is None:
        window = hann_window(n_fft, dtype=x.dtype)
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode="reflect")
    frames = frame(x, n_fft, hop) * window
    return jnp.fft.rfft(frames, axis=-1)


def spectrogram(x: jnp.ndarray, n_fft: int, hop: int, power: float = 2.0) -> jnp.ndarray:
    """|STFT|^power of (..., T) -> (..., n_frames, n_freqs), fp32."""
    s = stft(x.astype(jnp.float32), n_fft, hop)
    mag2 = s.real * s.real + s.imag * s.imag
    if power == 2.0:
        return mag2
    if power == 1.0:
        return jnp.sqrt(mag2)
    return jnp.power(mag2, power / 2.0)


def hz_to_mel(f):
    """HTK mel scale (torchaudio melscale_fbanks mel_scale='htk')."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """Triangular HTK mel filterbank, shape (n_freqs, n_mels), norm=None.

    Matches torchaudio.functional.melscale_fbanks defaults used by the
    reference MultiScaleMelLoss (ref: py/main14.py:156-159).  Computed once
    in float64 on host; baked into the jitted graph as a constant so the
    mel projection is a single MXU matmul.
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / (f_pts[1:-1] - f_pts[:-2])
    up = slopes[:, 2:] / (f_pts[2:] - f_pts[1:-1])
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def mel_spectrogram(
    x: jnp.ndarray,
    *,
    sample_rate: int = 16000,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 64,
    power: float = 2.0,
) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, n_mels) power mel spectrogram.

    Equivalent to torchaudio.transforms.MelSpectrogram(sample_rate, n_fft,
    hop_length, n_mels) up to the (time, freq) layout transpose.
    """
    spec = spectrogram(x, n_fft, hop, power=power)
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate))
    # (..., frames, n_freqs) @ (n_freqs, n_mels) — MXU matmul.
    return jnp.matmul(spec, fb, preferred_element_type=jnp.float32)


def log_mel(x: jnp.ndarray, eps: float = 1e-5, **kw) -> jnp.ndarray:
    """log(mel + eps) as used by MultiScaleMelLoss (ref: py/main14.py:161-163)."""
    return jnp.log(mel_spectrogram(x, **kw) + eps)
