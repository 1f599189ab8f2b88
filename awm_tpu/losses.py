"""The 5(6)-term watermarking loss stack as one fused, jit-safe function.

Reference semantics (ref: py/main14.py:185-239, py/main16.py:223-294):

- loc: BCE-with-logits over per-sample detection logits of the concatenated
  [watermarked; clean] 2B batch vs [ones; zeros] targets (py/main14.py:203-217)
- dec: BCE over per-bit logits of the watermarked half vs the message bits
  expanded over all timesteps (py/main14.py:220-223)
- l1: mean |delta| energy penalty (py/main14.py:226)
- mel: L1 between log(mel+1e-5) of clean vs watermarked, n_fft=1024 hop=256
  n_mels=64 — "MultiScaleMelLoss" is single-scale in the reference
  (py/main14.py:154-164); a true multi-scale option is provided
- loud: masked squared STFT-magnitude diff, window 2048 hop 512, mask where
  |STFT(clean)| > 0.01, mean over ALL cells (py/main14.py:166-179)
- hf: mean |STFT(delta)| above cutoff, n_fft=512 hop=128 (py/main16.py:74-81)

Everything is computed inside the jitted train step so the STFTs, filterbank
matmul and reductions fuse into a single XLA graph — no host round-trips
(the reference syncs .item() per term per batch, py/main14.py:236).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from awm_tpu.config import LossConfig
from awm_tpu.dsp import log_mel, spectrogram, stft
from awm_tpu.models.messages import message_to_bits


def bce_with_logits_per(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Element-wise binary cross-entropy with logits, numerically stable
    (identical math to F.binary_cross_entropy_with_logits, no reduction)."""
    z = logits.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    return jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy with logits."""
    return bce_with_logits_per(logits, targets).mean()


def loc_loss(detection_logits: jnp.ndarray) -> jnp.ndarray:
    """Detection BCE.  detection_logits: (2B, T) — first half watermarked
    (target 1), second half clean (target 0)."""
    two_b = detection_logits.shape[0]
    b = two_b // 2
    targets = jnp.concatenate(
        [jnp.ones((b,) + detection_logits.shape[1:]), jnp.zeros((b,) + detection_logits.shape[1:])]
    )
    return bce_with_logits(detection_logits, targets)


def dec_loss(
    decode_logits: jnp.ndarray,
    message: jnp.ndarray,
    bits: int = 16,
    mode: str = "per_sample",
    bit_balance: float = 0.0,
) -> jnp.ndarray:
    """Bit-decode BCE on the watermarked half.  decode_logits: (B, T, bits).

    mode="per_sample" is the reference objective (ref: py/main14.py:220-223):
    the target is expanded over all T, demanding every ~15-sample detector
    window decode all 16 bits on its own — unsatisfiable at −42 dBFS delta,
    so the optimum collapses to logit 0 (= the reference's published 0.5009
    bit accuracy, BASELINE.md).  mode="mean" trains the statistic inference
    actually thresholds — the TIME-MEAN logit (ref decode rule:
    py/main14.py:925-929) — letting 16,000 weak per-window cues accumulate
    into one decodable bit.

    bit_balance > 0 (mode="mean" only) re-weights each bit position's BCE by
    (its batch-mean BCE / the mean over positions)^bit_balance, weights
    stop-gradiented and normalized to mean 1.  Motivation: band-limited runs
    collapse to a winner-take-all subspace — measured on runs/blR2 (evidence/
    blDiag): 5 of 16 bit positions decode at ~1.0 with |time-mean logit|
    7.5–18.9 while the other 11 sit at exact chance with |logit| ≤ 0.25, so
    the flat mean leaves ~0.69·11/16 of dec BCE permanently on the table.
    Balancing concentrates the dec budget on unlearned positions (a dead bit
    among 15 learned ones sees ~bits× its flat-mean pressure) and self-
    anneals back to the flat mean as positions equalize."""
    target = message_to_bits(message, bits)  # (B, bits)
    if mode == "mean":
        per = bce_with_logits_per(decode_logits.mean(axis=1), target)  # (B, bits)
        if bit_balance > 0.0:
            per_bit = per.mean(axis=0)  # (bits,)
            w = (per_bit / (per_bit.mean() + 1e-8)) ** bit_balance
            w = jax.lax.stop_gradient(w / (w.mean() + 1e-8))
            return (per * w).mean()
        return per.mean()
    if mode != "per_sample":
        # fail fast: an unrecognized mode silently training the reference's
        # collapsing per-sample objective would defeat the run's purpose
        raise ValueError(f"dec_loss mode must be 'per_sample' or 'mean', got {mode!r}")
    target = jnp.broadcast_to(target[:, None, :], decode_logits.shape)
    return bce_with_logits(decode_logits, target)


def l1_delta_loss(delta: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(delta).mean()


def mel_l1_loss(clean: jnp.ndarray, watermarked: jnp.ndarray, *, scales=((1024, 256),)) -> jnp.ndarray:
    """L1 of log-mel difference.  Default single scale = reference behavior;
    pass multiple (n_fft, hop) scales for a true multi-scale loss."""
    total = 0.0
    for n_fft, hop in scales:
        m1 = log_mel(clean, n_fft=n_fft, hop=hop)
        m2 = log_mel(watermarked, n_fft=n_fft, hop=hop)
        total = total + jnp.abs(m1 - m2).mean()
    return total / len(scales)


def tf_loudness_loss(clean: jnp.ndarray, watermarked: jnp.ndarray) -> jnp.ndarray:
    """Masked TF loudness loss (crude psychoacoustic masking),
    window 2048 hop 512 (ref: py/main14.py:166-179)."""
    sc = jnp.abs(stft(clean.astype(jnp.float32), 2048, 512))
    sw = jnp.abs(stft(watermarked.astype(jnp.float32), 2048, 512))
    mask = (sc > 0.01).astype(jnp.float32)
    return (jnp.square(sw - sc) * mask).mean()


def high_freq_penalty(
    delta: jnp.ndarray,
    cutoff_hz: float = 3500.0,
    n_fft: int = 512,
    sample_rate: int = 16000,
) -> jnp.ndarray:
    """Mean |STFT(delta)| above cutoff (ref: py/main16.py:74-81)."""
    hop = n_fft // 4
    spec = jnp.sqrt(spectrogram(delta, n_fft, hop) + 1e-12)
    freqs = np.fft.rfftfreq(n_fft, 1.0 / sample_rate)
    mask = jnp.asarray((freqs > cutoff_hz).astype(np.float32))
    return (spec * mask).mean()


def total_loss(
    cfg: LossConfig,
    *,
    s: jnp.ndarray,
    s_w: jnp.ndarray,
    delta: jnp.ndarray,
    logits: jnp.ndarray,
    message: jnp.ndarray,
    message_bits: int = 16,
) -> Dict[str, jnp.ndarray]:
    """Weighted sum + per-term dict.  logits: (2B, T, 1+bits) from the
    detector over concat([s_w, s])."""
    b = s.shape[0]
    detection_logits = logits[:, :, 0]
    decode_logits = logits[:b, :, 1:]
    terms = {
        "loc": loc_loss(detection_logits),
        "dec": dec_loss(decode_logits, message, message_bits,
                        mode=cfg.dec_loss_mode, bit_balance=cfg.dec_bit_balance),
        "l1": l1_delta_loss(delta),
        "mel": mel_l1_loss(s, s_w, scales=cfg.mel_scales),
        "loud": tf_loudness_loss(s, s_w),
    }
    total = (
        cfg.lambda_l1 * terms["l1"]
        + cfg.lambda_msspec * terms["mel"]
        + cfg.lambda_loud * terms["loud"]
        + cfg.lambda_loc * terms["loc"]
        + cfg.lambda_dec * terms["dec"]
    )
    if cfg.hf_penalty_w > 0.0:
        terms["hf"] = high_freq_penalty(delta, cfg.hf_cutoff_hz, cfg.hf_n_fft)
        total = total + cfg.hf_penalty_w * terms["hf"]
    terms["total"] = total
    return terms


def term_keys(cfg: LossConfig) -> tuple:
    """The keys total_loss will return under this config — lets callers
    (trainer.fit select_metric) validate metric names before training."""
    keys = ("loc", "dec", "l1", "mel", "loud")
    if cfg.hf_penalty_w > 0.0:
        keys = keys + ("hf",)
    return keys + ("total",)
