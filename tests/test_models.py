"""Model shape/param/behavior tests (SURVEY.md section 4 test plan).

Architecture contracts from the reference: generator (B,T)+(B,)->delta (B,T)
(ref: py/main14.py:111-124), detector (B,T)->(B,T,17) per-sample logits
(ref: py/main14.py:145-148), detector tensor-element count 52,053 including
BN running stats (verified against models/detector_best.pth — SURVEY.md 2.4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from awm_tpu.models import (
    Detector,
    Generator,
    StridedDetector,
    StridedGenerator,
    bits_to_message,
    build_models,
    decode_bits_majority,
    decode_bits_mean_logit,
    message_to_bits,
)
from awm_tpu.config import get_config

T = 1600  # shorter than 16000 for test speed; both nets are length-agnostic


@pytest.fixture(scope="module")
def gen_det():
    gen = Generator(message_bits=16)
    det = Detector(message_bits=16)
    key = jax.random.key(0)
    s = jnp.zeros((2, T))
    msg = jnp.array([5, 70], dtype=jnp.int32)
    gvars = gen.init(key, s, msg)
    dvars = det.init(key, s)
    return gen, det, gvars, dvars


def test_generator_shapes(gen_det):
    gen, _, gvars, _ = gen_det
    s = jnp.asarray(np.random.default_rng(0).standard_normal((2, T)), dtype=jnp.float32)
    msg = jnp.array([3, 65535], dtype=jnp.int32)
    delta = gen.apply(gvars, s, msg)
    assert delta.shape == (2, T)
    assert np.isfinite(np.asarray(delta)).all()


def test_generator_message_changes_delta(gen_det):
    gen, _, gvars, _ = gen_det
    s = jnp.asarray(np.random.default_rng(0).standard_normal((1, T)), dtype=jnp.float32)
    d1 = gen.apply(gvars, s, jnp.array([1], dtype=jnp.int32))
    d2 = gen.apply(gvars, s, jnp.array([2], dtype=jnp.int32))
    assert float(jnp.abs(d1 - d2).max()) > 1e-6


def test_generator_bits_encoding():
    """message_encoding='bits': bit-compositional pathway replaces the 2^16
    table; flipping ONE bit changes delta; param tree has no 64k-row table."""
    gen = Generator(message_bits=16, message_encoding="bits")
    s = jnp.asarray(np.random.default_rng(0).standard_normal((1, T)), dtype=jnp.float32)
    gvars = gen.init(jax.random.key(0), s, jnp.array([0], dtype=jnp.int32))
    params = gvars["params"]
    assert "bit_proj" in params and "embedding" not in params
    assert params["bit_proj"]["kernel"].shape == (16, 64)
    d1 = gen.apply(gvars, s, jnp.array([0b0000], dtype=jnp.int32))
    d2 = gen.apply(gvars, s, jnp.array([0b0100], dtype=jnp.int32))
    assert float(jnp.abs(d1 - d2).max()) > 1e-6
    assert d1.shape == (1, T)


def test_detector_dilated_decode_head():
    """decode_head='dilated': same (B, T, 1+bits) output; detection channel
    comes from the SHARED reference trunk (bit-identical to decode_head=
    'shared' given the same trunk params); bit channels from the dilated
    stack."""
    det_s = Detector(message_bits=16)
    det_d = Detector(message_bits=16, decode_head="dilated")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, T)), dtype=jnp.float32)
    vs = det_s.init(jax.random.key(0), x)
    vd = det_d.init(jax.random.key(0), x)
    assert {"dec_dil1", "dec_dil2", "dec_dil3", "dec_out"} <= set(vd["params"])
    out = det_d.apply(vd, x)
    assert out.shape == (2, T, 17)
    # graft the dilated model's trunk params into the shared model: channel 0
    # must match exactly (imported reference checkpoints keep their behavior)
    trunk = {k: vd["params"][k] for k in ("conv_in", "res1", "res2", "conv_out")}
    bs = {k: vd["batch_stats"][k] for k in ("res1", "res2")}
    out_s = det_s.apply({"params": trunk, "batch_stats": bs}, x)
    np.testing.assert_array_equal(np.asarray(out[..., 0]), np.asarray(out_s[..., 0]))


def test_generator_delta_band_limit():
    """delta_band_hz band-limits the carrier by construction: out-of-band
    energy is negligible and the carrier survives the resample@8k round trip
    (the attack the constraint exists to defeat — DEMO.md capstone)."""
    gen = Generator(message_bits=16, delta_band_hz=3000.0)
    key = jax.random.key(0)
    s = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16000)) * 0.1,
        dtype=jnp.float32,
    )
    msg = jnp.array([5, 70], dtype=jnp.int32)
    gvars = gen.init(key, s, msg)
    delta = np.asarray(gen.apply(gvars, s, msg))

    spec = np.abs(np.fft.rfft(delta, axis=-1)) ** 2
    freqs = np.fft.rfftfreq(16000, 1 / 16000)
    oob = spec[:, freqs > 3600.0].sum() / spec.sum()
    assert oob < 1e-4, f"out-of-band energy fraction {oob}"

    from awm_tpu.augment import resample_roundtrip

    d_att = np.asarray(resample_roundtrip(jnp.asarray(delta), 8000))
    corr = (delta * d_att).sum() / np.sqrt(
        (delta**2).sum() * (d_att**2).sum()
    )
    assert corr > 0.95, f"carrier correlation through resample@8k {corr}"


def test_generator_without_message(gen_det):
    gen, _, gvars, _ = gen_det
    s = jnp.zeros((1, T))
    delta = gen.apply(gvars, s, None)
    assert delta.shape == (1, T)


def test_detector_shapes_and_param_count(gen_det):
    _, det, _, dvars = gen_det
    s = jnp.asarray(np.random.default_rng(1).standard_normal((3, T)), dtype=jnp.float32)
    logits = det.apply(dvars, s)
    assert logits.shape == (3, T, 17)
    # 51,537 trainable + 512 BN running stats = 52,049; the reference's
    # 52,053 additionally counts 4 torch num_batches_tracked scalars.
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(dvars["params"]))
    n_stats = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(dvars["batch_stats"]))
    assert n_params == 51537
    assert n_stats == 512


def test_detector_train_mode_updates_batch_stats(gen_det):
    _, det, _, dvars = gen_det
    s = jnp.asarray(np.random.default_rng(2).standard_normal((4, T)), dtype=jnp.float32)
    out, updates = det.apply(dvars, s, train=True, mutable=["batch_stats"])
    assert out.shape == (4, T, 17)
    before = jax.tree.leaves(dvars["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    assert any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(after, before))


def test_message_bits_roundtrip():
    msgs = jnp.array([0, 1, 2, 65535, 43690, 21845], dtype=jnp.int32)
    bits = message_to_bits(msgs, 16)
    assert bits.shape == (6, 16)
    # LSB-first convention: (msg & 1) is bit 0 (ref: py/main14.py:220-221)
    np.testing.assert_array_equal(np.asarray(bits[1]), [1] + [0] * 15)
    back = bits_to_message(bits)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(msgs))


def test_decode_rules():
    # logits constant over time: both rules agree with sign
    logits = jnp.broadcast_to(
        jnp.array([[1.0, -2.0, 3.0, -0.5]]), (5, 4)
    )[None, :, :]
    np.testing.assert_array_equal(
        np.asarray(decode_bits_mean_logit(logits)), [[1, 0, 1, 0]]
    )
    np.testing.assert_array_equal(
        np.asarray(decode_bits_majority(logits)), [[1, 0, 1, 0]]
    )


def test_strided_models_shapes():
    gen = StridedGenerator(message_bits=16)
    det = StridedDetector(message_bits=16)
    key = jax.random.key(0)
    s = jnp.zeros((1, 16000))  # strided arch needs T divisible-ish by 320
    msg = jnp.array([7], dtype=jnp.int32)
    gvars = gen.init(key, s, msg)
    delta = gen.apply(gvars, s, msg)
    assert delta.shape == (1, 16000)
    dvars = det.init(key, s)
    logits = det.apply(dvars, s)
    assert logits.shape == (1, 16000, 17)


def test_build_models_presets():
    for preset in ["base", "strided"]:
        cfg = get_config(preset)
        gen, det = build_models(cfg.model)
        assert gen.message_bits == 16 and det.message_bits == 16
