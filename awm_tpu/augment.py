"""On-device robustness augmentations: noise, volume, lowpass, quantize,
resample channel simulation.

The reference trains robustness only via main15c's lowpass+quantize
postprocess (main15c.ipynb cell 4); BASELINE.json's configs additionally
call for on-device noise/resample/volume augmentations.  All transforms here
are jit-safe, differentiable where meaningful, and driven by a jax PRNG key
so they run inside the training graph (no host round-trip per batch).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from awm_tpu.dsp import fir_lowpass, lowpass_biquad, quantize_int16


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Which channel attacks to simulate during training, with ranges.

    attack_prob applies each configured attack independently per example
    with that probability (both branches are computed; jnp.where selects).
    Keeping a fraction of examples un-attacked is essential: an always-on
    aggressive curriculum collapses the detector's clean/watermarked
    separation (measured: clean false-positive rate went to 1.0 when every
    example was resampled+volume-scaled)."""

    noise_snr_db: Optional[Tuple[float, float]] = None  # e.g. (20., 40.)
    volume_range: Optional[Tuple[float, float]] = None  # e.g. (0.3, 1.2)
    # One cutoff, or a tuple of cutoffs sampled per example (a lowpass
    # CURRICULUM, e.g. (3500., 5000., 7000.)).  A single aggressive-enough
    # dec-weighted fine-tune drives the watermark carrier into high
    # frequencies where decode is easy but a 4 kHz lowpass inverts detection
    # (measured: AUC 0.25 under lowpass_4k); training across a cutoff range
    # forces bit energy below the harshest cutoff.  Discrete choices rather
    # than a continuous range because the biquad's associative-scan
    # coefficients are compile-time scalars.
    lowpass_hz: Optional[Tuple[float, ...]] = None  # float also accepted
    # Filter family for the lowpass attack: the biquad's soft -12 dB/oct
    # rolloff leaks enough >cutoff carrier that a curriculum of biquad
    # cutoffs never forces the watermark fully in-band (measured: lowpass@4k
    # detection passes while resample@8k — whose 65-tap FIR anti-alias
    # truly erases out-of-band energy — stays at chance).  "fir" uses the
    # steep 101-tap windowed-sinc instead, closing that leak.
    lowpass_filter: str = "biquad"  # "biquad" | "fir"
    quantize: bool = False
    # 8-bit G.711 mu-law round trip (dsp/codec.py, audioop-exact) — the
    # telephony-codec training channel; like quantize, zero-gradient
    mulaw: bool = False
    # One target rate, or a tuple sampled per example (resample CURRICULUM,
    # e.g. (8000, 11025, 22050)) — arbitrary rational ratios via the
    # polyphase resampler (dsp.resample), so non-integer round trips like
    # 22.05 kHz are first-class training channels.
    resample_hz: Optional[int] = None  # int or tuple of ints
    attack_prob: float = 1.0  # per-example, per-attack application probability
    sample_rate: int = 16000
    # Apply the curriculum during validation too (deterministic, epoch-
    # independent keys — see trainer.fit).  Without this, val loc/dec measure
    # CLEAN detection, which is already converged when a robustness fine-tune
    # starts, so best-checkpoint selection freezes at epoch 0.
    val_attacks: bool = True


def add_noise(x: jnp.ndarray, key: jax.Array, snr_db_range: Tuple[float, float]) -> jnp.ndarray:
    """Additive white noise at a per-example random SNR."""
    k1, k2 = jax.random.split(key)
    b = x.shape[0]
    snr_db = jax.random.uniform(
        k1, (b, 1), minval=snr_db_range[0], maxval=snr_db_range[1]
    )
    noise = jax.random.normal(k2, x.shape, x.dtype)
    sig_rms = jnp.sqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-12)
    noise_rms = jnp.sqrt(jnp.mean(jnp.square(noise), axis=-1, keepdims=True) + 1e-12)
    gain = sig_rms / noise_rms * 10.0 ** (-snr_db / 20.0)
    return x + noise * gain


def random_volume(x: jnp.ndarray, key: jax.Array, vol_range: Tuple[float, float]) -> jnp.ndarray:
    """Per-example random gain."""
    b = x.shape[0]
    g = jax.random.uniform(key, (b, 1), minval=vol_range[0], maxval=vol_range[1])
    return x * g


def resample_roundtrip(x: jnp.ndarray, target_hz: int, sample_rate: int = 16000) -> jnp.ndarray:
    """Channel-style down-up resample at ANY rational ratio, on device.

    Kaiser-windowed polyphase in both directions (dsp.resample — scipy
    resample_poly parity), matching the reference I/O path's torchaudio
    Resample semantics (ref: py/main14.py:726-727) for non-integer round
    trips like 16 kHz -> 22.05 kHz -> 16 kHz.  Static shapes (the
    intermediate length is ceil(T*up/down)), differentiable, one strided
    multi-channel conv each way.  The round trip can land one sample short
    of T (ceil of the inverse ratio); the tail is zero-padded back.
    """
    from awm_tpu.dsp.resample import resample_rational

    t = x.shape[-1]
    y = resample_rational(x, sample_rate, target_hz)
    z = resample_rational(y, target_hz, sample_rate)
    if z.shape[-1] > t:
        z = z[..., :t]
    elif z.shape[-1] < t:
        pad = [(0, 0)] * (z.ndim - 1) + [(0, t - z.shape[-1])]
        z = jnp.pad(z, pad)
    return z


def apply_augment(x: jnp.ndarray, key: jax.Array, cfg: AugmentConfig) -> jnp.ndarray:
    """Apply the configured attack chain to (B, T) watermarked audio, each
    attack independently per example with probability cfg.attack_prob."""

    def maybe(key, attacked, clean):
        if cfg.attack_prob >= 1.0:
            return attacked
        mask = jax.random.bernoulli(key, cfg.attack_prob, (clean.shape[0], 1))
        return jnp.where(mask, attacked, clean)

    if cfg.noise_snr_db is not None:
        key, k1, k2 = jax.random.split(key, 3)
        x = maybe(k1, add_noise(x, k2, cfg.noise_snr_db), x)
    if cfg.volume_range is not None:
        key, k1, k2 = jax.random.split(key, 3)
        x = maybe(k1, random_volume(x, k2, cfg.volume_range), x)
    if cfg.resample_hz is not None:
        key, k1, k2 = jax.random.split(key, 3)
        rates = (
            tuple(cfg.resample_hz)
            if isinstance(cfg.resample_hz, (tuple, list))
            else (cfg.resample_hz,)
        )
        if len(rates) == 1:
            att = resample_roundtrip(x, rates[0], cfg.sample_rate)
        else:  # per-example curriculum over the discrete rate choices
            choice = jax.random.randint(k2, (x.shape[0], 1), 0, len(rates))
            att = jnp.zeros_like(x)
            for i, r in enumerate(rates):
                att = jnp.where(choice == i, resample_roundtrip(x, r, cfg.sample_rate), att)
        x = maybe(k1, att, x)
    if cfg.lowpass_hz is not None:
        key, k1, k2 = jax.random.split(key, 3)
        cuts = (
            tuple(cfg.lowpass_hz)
            if isinstance(cfg.lowpass_hz, (tuple, list))
            else (cfg.lowpass_hz,)
        )
        if cfg.lowpass_filter == "fir":
            lpf = lambda x, c: fir_lowpass(x, c, taps=101, sample_rate=cfg.sample_rate)
        else:
            lpf = lambda x, c: lowpass_biquad(x, cfg.sample_rate, c)
        if len(cuts) == 1:
            att = lpf(x, cuts[0])
        else:  # per-example curriculum over the discrete cutoff choices
            choice = jax.random.randint(k2, (x.shape[0], 1), 0, len(cuts))
            att = jnp.zeros_like(x)
            for i, c in enumerate(cuts):
                att = jnp.where(choice == i, lpf(x, c), att)
        x = maybe(k1, att, x)
    if cfg.quantize:
        key, k1 = jax.random.split(key)
        x = maybe(k1, quantize_int16(x), x)
    if cfg.mulaw:
        from awm_tpu.dsp import mulaw_roundtrip

        key, k1 = jax.random.split(key)
        x = maybe(k1, mulaw_roundtrip(x), x)
    return x
