"""SECDED message code tests (awm_tpu.ecc): exhaustive round-trip, full
single-error correction, double-error detection, API integration."""

import numpy as np
import pytest

from awm_tpu.ecc import (
    CODE_BITS,
    PAYLOAD_BITS,
    ecc_decode,
    ecc_decode_batch,
    ecc_encode,
)


def test_roundtrip_exhaustive():
    """All 2048 payloads survive encode->decode untouched."""
    for p in range(2**PAYLOAD_BITS):
        word = ecc_encode(p)
        assert 0 <= word < 2**CODE_BITS
        got, corrected, ok = ecc_decode(word)
        assert (got, corrected, ok) == (p, 0, True)


def test_codewords_unique_and_distance():
    """2048 distinct codewords; SECDED minimum distance is 4 (spot-checked
    pairwise on a subsample — full pairwise is 2M pairs)."""
    words = [ecc_encode(p) for p in range(2**PAYLOAD_BITS)]
    assert len(set(words)) == 2**PAYLOAD_BITS
    rng = np.random.default_rng(0)
    idx = rng.choice(len(words), size=(200, 2))
    for i, j in idx:
        if i == j:
            continue
        assert bin(words[i] ^ words[j]).count("1") >= 4


def test_single_error_corrected_every_position():
    """Any one of the 16 bits flipped -> payload recovered, corrected=1."""
    for p in (0, 1, 0x5A5, 2**PAYLOAD_BITS - 1):
        word = ecc_encode(p)
        for bit in range(CODE_BITS):
            got, corrected, ok = ecc_decode(word ^ (1 << bit))
            assert (got, corrected, ok) == (p, 1, True), (p, bit)


def test_double_error_detected_not_miscorrected():
    """Two flipped bits -> ok=False (never silently the wrong payload with
    ok=True)."""
    p = 0x3C3
    word = ecc_encode(p)
    rng = np.random.default_rng(1)
    for _ in range(100):
        b1, b2 = rng.choice(CODE_BITS, size=2, replace=False)
        _, _, ok = ecc_decode(word ^ (1 << int(b1)) ^ (1 << int(b2)))
        assert not ok


def test_payload_range_validation():
    with pytest.raises(ValueError):
        ecc_encode(2**PAYLOAD_BITS)
    with pytest.raises(ValueError):
        ecc_encode(-1)
    with pytest.raises(ValueError):
        ecc_decode([0, 1])


def test_decode_batch():
    payloads = np.arange(32)
    words = np.asarray([ecc_encode(int(p)) for p in payloads])
    words[3] ^= 1 << 9  # single error
    got, corrected, ok = ecc_decode_batch(words)
    np.testing.assert_array_equal(got, payloads)
    assert corrected.sum() == 1 and ok.all()
    # bit-array form
    bits = ((words[:, None] >> np.arange(16)) & 1).astype(int)
    got2, _, _ = ecc_decode_batch(bits)
    np.testing.assert_array_equal(got2, payloads)


def test_api_embed_detect_verify_ecc():
    """API plumbing: embed --ecc records payloads and embeds codewords;
    detect --ecc decodes the predicted bits; verify --ecc tests against the
    encoded codeword (mechanics only — skill claims live in DEMO.md)."""
    import dataclasses

    import jax

    from awm_tpu import api
    from awm_tpu import train as tr
    from awm_tpu.config import get_config

    cfg = dataclasses.replace(get_config("base"), audio_len=800)
    state, gen, det = tr.init_state(cfg, jax.random.key(0))
    sess = api.InferenceSession.from_state(cfg, gen, det, state)

    wav = np.random.default_rng(5).standard_normal(1600).astype(np.float32) * 0.1
    res = api.watermark_array(wav, sess, message=1234, ecc=True)
    assert list(res["payloads"]) == [1234, 1234]
    assert all(int(m) == ecc_encode(1234) for m in res["messages"])

    det_out = api.detect_array(wav, sess, ecc=True)
    assert set(det_out["ecc"]) == {"payload", "corrected_bits", "ok"}

    v = api.verify_array(wav, sess, 1234, ecc=True)
    assert v["expected_payload"] == 1234
    assert v["expected_message"] == ecc_encode(1234)

    with pytest.raises(ValueError):
        api.watermark_array(wav, sess, message=4096, ecc=True)
