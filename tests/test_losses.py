"""Loss-stack golden tests vs torch formulations (ref: py/main14.py:154-239)."""

import numpy as np
import pytest

import jax.numpy as jnp

from awm_tpu.config import LossConfig
from awm_tpu import losses
from awm_tpu.shaping import clamp_peak, limit_rms, shape_delta
from awm_tpu.config import ShapingConfig


def test_bce_with_logits_matches_torch(rng):
    import torch

    z = rng.standard_normal((4, 100)).astype(np.float32) * 3
    y = (rng.random((4, 100)) > 0.5).astype(np.float32)
    ours = float(losses.bce_with_logits(jnp.asarray(z), jnp.asarray(y)))
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(z), torch.from_numpy(y)
    ).item()
    assert abs(ours - ref) < 1e-6


def test_loc_loss_targets(rng):
    # Perfect detector: +big on wm half, -big on clean half -> near-zero loss.
    b, t = 3, 50
    logits = np.concatenate([np.full((b, t), 20.0), np.full((b, t), -20.0)]).astype(np.float32)
    assert float(losses.loc_loss(jnp.asarray(logits))) < 1e-6
    # Inverted -> huge loss
    assert float(losses.loc_loss(jnp.asarray(-logits))) > 10.0


def test_dec_loss_bit_convention():
    # message 5 = bits [1,0,1,0,...]; logits agreeing -> small loss
    msg = jnp.array([5], dtype=jnp.int32)
    bits = np.array([1, 0, 1] + [0] * 13, dtype=np.float32)
    logits = (bits * 2 - 1)[None, None, :] * 20.0  # (1,1,16)
    logits = jnp.broadcast_to(jnp.asarray(logits), (1, 10, 16))
    assert float(losses.dec_loss(logits, msg)) < 1e-6


def test_dec_loss_mean_mode():
    """mode='mean' scores the TIME-MEAN logit (the inference decode
    statistic): per-sample sign errors that cancel in the mean are free."""
    msg = jnp.array([5], dtype=jnp.int32)  # bits [1,0,1,0,...]
    bits = np.array([1, 0, 1] + [0] * 13, dtype=np.float32)
    signs = (bits * 2 - 1)[None, None, :]
    # alternate +-30 and -+10 per timestep: mean logit = +-10 (correct sign)
    # but half the timesteps have the WRONG sign per-sample
    logits = jnp.asarray(
        np.concatenate([signs * 30.0, -signs * 10.0] * 5, axis=1), jnp.float32
    )  # (1, 10, 16)
    assert float(losses.dec_loss(logits, msg, mode="mean")) < 1e-4
    assert float(losses.dec_loss(logits, msg, mode="per_sample")) > 1.0
    # constant logits: both modes agree
    const = jnp.broadcast_to(jnp.asarray(signs * 20.0), (1, 10, 16))
    np.testing.assert_allclose(
        float(losses.dec_loss(const, msg, mode="mean")),
        float(losses.dec_loss(const, msg, mode="per_sample")),
        rtol=1e-6,
    )


def test_dec_loss_bit_balance():
    """bit_balance re-weights positions by relative error: γ=0 is the flat
    mean; γ>0 up-weights an unlearned bit and the weighted loss exceeds the
    flat mean when errors are concentrated (weights normalized to mean 1)."""
    rng = np.random.default_rng(0)
    msgs = jnp.asarray(rng.integers(0, 2**16, size=64), jnp.int32)
    target = ((np.asarray(msgs)[:, None] & (1 << np.arange(16))) > 0).astype(np.float32)
    # bits 0..14 decoded confidently, bit 15 dead (logit 0)
    logits = (target * 2 - 1) * 12.0
    logits[:, 15] = 0.0
    logits = jnp.broadcast_to(jnp.asarray(logits[:, None, :], jnp.float32), (64, 4, 16))

    flat = float(losses.dec_loss(logits, msgs, mode="mean"))
    bal0 = float(losses.dec_loss(logits, msgs, mode="mean", bit_balance=0.0))
    bal1 = float(losses.dec_loss(logits, msgs, mode="mean", bit_balance=1.0))
    np.testing.assert_allclose(bal0, flat, rtol=1e-6)
    # flat mean: ln2/16 from the dead bit; balanced: its weight -> ~16,
    # so the loss approaches the dead bit's full ln2
    assert bal1 > 10 * flat
    assert bal1 < np.log(2) * 1.05
    # uniform errors: balancing is a no-op
    uni = jnp.zeros((64, 4, 16), jnp.float32)
    np.testing.assert_allclose(
        float(losses.dec_loss(uni, msgs, mode="mean", bit_balance=1.0)),
        float(losses.dec_loss(uni, msgs, mode="mean")),
        rtol=1e-5,
    )


def test_mel_l1_matches_torch_mel(speechlike, rng):
    """End-to-end check of the mel loss vs a from-scratch torch replica of
    torchaudio's MelSpectrogram (center pad, HTK fbanks, power 2)."""
    import torch

    clean = speechlike
    wm = (clean + 0.01 * rng.standard_normal(16000)).astype(np.float32)

    ours = float(losses.mel_l1_loss(jnp.asarray(clean[None]), jnp.asarray(wm[None])))

    # torch replica using our filterbank constants (validated separately
    # against the HTK formula) and torch.stft
    from awm_tpu.dsp import mel_filterbank

    fb = torch.from_numpy(mel_filterbank(513, 64, 16000).copy())

    def tmel(x):
        s = torch.stft(
            torch.from_numpy(x), 1024, 256, window=torch.hann_window(1024),
            return_complex=True,
        )
        p = (s.abs() ** 2).T  # (frames, freq)
        return torch.log(p @ fb + 1e-5)

    ref = torch.nn.functional.l1_loss(tmel(clean), tmel(wm)).item()
    assert abs(ours - ref) / max(abs(ref), 1e-8) < 1e-3


def test_tf_loudness_matches_torch(speechlike, rng):
    import torch

    clean = speechlike
    wm = (clean + 0.005 * rng.standard_normal(16000)).astype(np.float32)
    ours = float(losses.tf_loudness_loss(jnp.asarray(clean[None]), jnp.asarray(wm[None])))

    w = torch.hann_window(2048)
    sc = torch.stft(torch.from_numpy(clean), 2048, 512, window=w, return_complex=True).abs()
    sw = torch.stft(torch.from_numpy(wm), 2048, 512, window=w, return_complex=True).abs()
    mask = (sc > 0.01).float()
    ref = (((sw - sc) ** 2) * mask).mean().item()
    assert abs(ours - ref) / max(abs(ref), 1e-12) < 2e-2  # fp32 stft noise on tiny diffs


def test_high_freq_penalty_discriminates():
    t = np.arange(16000) / 16000.0
    lo = 0.01 * np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    hi = 0.01 * np.sin(2 * np.pi * 6000 * t).astype(np.float32)
    p_lo = float(losses.high_freq_penalty(jnp.asarray(lo[None])))
    p_hi = float(losses.high_freq_penalty(jnp.asarray(hi[None])))
    assert p_hi > 20 * p_lo


def test_total_loss_weighting(speechlike, rng):
    cfg = LossConfig()
    b, t = 2, 16000
    s = jnp.asarray(np.stack([speechlike, speechlike[::-1]]))
    delta = jnp.asarray(0.005 * rng.standard_normal((b, t)).astype(np.float32))
    s_w = s + delta
    logits = jnp.asarray(rng.standard_normal((2 * b, t, 17)).astype(np.float32))
    msg = jnp.array([7, 99], dtype=jnp.int32)
    terms = losses.total_loss(cfg, s=s, s_w=s_w, delta=delta, logits=logits, message=msg)
    expect = (
        0.1 * terms["l1"] + 2.0 * terms["mel"] + 10.0 * terms["loud"]
        + 10.0 * terms["loc"] + 1.0 * terms["dec"]
    )
    assert abs(float(terms["total"] - expect)) < 1e-5
    assert "hf" not in terms
    cfg16 = LossConfig(hf_penalty_w=5.0)
    terms16 = losses.total_loss(cfg16, s=s, s_w=s_w, delta=delta, logits=logits, message=msg)
    assert "hf" in terms16
    assert float(terms16["total"]) > 0


def test_shaping_chain_invariants(rng):
    d = jnp.asarray(0.1 * rng.standard_normal((2, 16000)).astype(np.float32))
    assert float(jnp.abs(clamp_peak(d, 0.02)).max()) <= 0.02
    lim = limit_rms(d, 0.005)
    got_rms = np.sqrt(np.mean(np.asarray(lim) ** 2, axis=1))
    assert (got_rms <= 0.005 + 1e-6).all()
    # small deltas pass through unscaled
    small = 0.001 * d / float(jnp.abs(d).max())
    np.testing.assert_allclose(np.asarray(limit_rms(small, 0.005)), np.asarray(small), rtol=1e-4)
    # full chain output respects both caps
    out = shape_delta(d, ShapingConfig(enabled=True))
    assert float(jnp.abs(out).max()) <= 0.02 + 1e-6
    assert (np.sqrt(np.mean(np.asarray(out) ** 2, axis=1)) <= 0.005 + 1e-6).all()
