"""Embed/detect API tests: chunking semantics, round-trip, folder batch
processing (ref API contracts: py/main14.py:719-949, py/main15.py:1480-1517)."""

import dataclasses
import os

import numpy as np
import pytest

import jax

from awm_tpu import api, eval as ev
from awm_tpu.config import get_config
from awm_tpu import train as tr
from awm_tpu.utils.audio_io import save_wav

CHUNK = 800  # small chunk length for CPU test speed


@pytest.fixture(scope="module")
def session():
    cfg = dataclasses.replace(get_config("base"), audio_len=CHUNK)
    state, gen, det = tr.init_state(cfg, jax.random.key(0))
    return api.InferenceSession.from_state(cfg, gen, det, state)


@pytest.fixture(scope="module")
def trained_session():
    """Briefly overfit so detection actually separates."""
    cfg = dataclasses.replace(get_config("base"), audio_len=CHUNK)
    rng = np.random.default_rng(0)
    t = np.arange(CHUNK) / 16000.0
    batch = np.stack(
        [0.3 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(CHUNK) for f in (220, 330, 440, 550)]
    ).astype(np.float32)
    state, gen, det = tr.init_state(cfg, jax.random.key(1))
    tx = tr.make_optimizer(cfg)
    key = jax.random.key(2)
    import jax.numpy as jnp

    b = jnp.asarray(batch)
    for _ in range(120):
        state, _ = tr.train_step(cfg, gen, det, tx, state, b, key)
    return api.InferenceSession.from_state(cfg, gen, det, state), batch


def test_to_chunks_padding():
    chunks, total = api._to_chunks(np.ones(2500, np.float32), 800)
    assert chunks.shape == (4, 800) and total == 2500
    assert chunks[3, 100:].sum() == 0  # tail zero-padded
    chunks, total = api._to_chunks(np.ones(1600, np.float32), 800)
    assert chunks.shape == (2, 800)


def test_bucket_sizes():
    assert [api._bucket(n) for n in (1, 2, 3, 5, 9, 500, 513)] == [1, 2, 4, 8, 16, 512, 512]


def test_watermark_array_roundtrip_shapes(session):
    wav = np.random.default_rng(0).standard_normal(2500).astype(np.float32) * 0.1
    res = api.watermark_array(wav, session, seed=0)
    assert res["watermarked_waveform"].shape == (2500,)
    assert res["delta_waveform"].shape == (2500,)
    assert len(res["messages"]) == 4  # ceil(2500/800) chunks, fresh msg each
    np.testing.assert_allclose(
        res["watermarked_waveform"], wav + res["delta_waveform"], atol=1e-6
    )


def test_fixed_message(session):
    wav = np.zeros(1600, np.float32)
    res = api.watermark_array(wav, session, message=1234)
    assert (res["messages"] == 1234).all()


def test_detect_array_contract(session):
    wav = np.random.default_rng(1).standard_normal(2000).astype(np.float32) * 0.1
    r = api.detect_array(wav, session)
    assert r["temporal_probs"].shape == (2000,)
    assert 0.0 <= r["mean_probability"] <= 1.0
    assert len(r["predicted_message"]) == 16
    assert len(r["message_confidence"]) == 16
    assert r["decision"] in ("WATERMARKED", "NOT WATERMARKED")


def test_file_roundtrip_trained(tmp_path, trained_session):
    """Multi-second file: watermarked detection prob must clearly exceed the
    clean-file prob after the brief overfit."""
    sess, batch = trained_session
    clip = np.concatenate([batch[i % 4] for i in range(5)])  # 5 chunks
    p = str(tmp_path / "clean.wav")
    save_wav(p, clip, 16000)

    out = str(tmp_path / "wm.wav")
    res = api.generate_watermarked_audio(p, sess, out, seed=0)
    assert os.path.exists(out)
    m = res["metrics"]
    assert np.isfinite(m["watermark_rms"]) and np.isfinite(m["si_snr_db"])

    det_clean = api.detect_watermark(p, sess)
    det_wm = api.detect_watermark(out, sess)
    assert det_wm["mean_probability"] > det_clean["mean_probability"] + 0.15


def test_binom_sf_goldens():
    """Exact binomial tail vs scipy (the verify p-value null)."""
    from scipy.stats import binom

    for n in (16, 32):
        for k in (0, 1, n // 2, n - 1, n):
            np.testing.assert_allclose(
                api._binom_sf(k, n), binom.sf(k - 1, n, 0.5), rtol=1e-12
            )
    assert api._binom_sf(0, 16) == 1.0
    assert api._binom_sf(16, 16) == 2.0**-16


def test_verify_array_contract(session):
    """verify_array is self-consistent regardless of model skill: verifying
    against the decoded message gives full agreement / the smallest p-value;
    against its bitwise complement gives zero agreement / p=1.  AUTHENTIC
    requires BOTH detection and significance."""
    wav = np.random.default_rng(2).standard_normal(2000).astype(np.float32) * 0.1
    det = api.detect_array(wav, session)
    decoded = int(
        (np.asarray(det["predicted_message"]).astype(np.int64) << np.arange(16)).sum()
    )
    r = api.verify_array(wav, session, decoded)
    assert r["bit_agreement"] == 16 and r["p_value"] == 2.0**-16
    assert r["decoded_message"] == decoded and r["match_margin"] > 0
    assert r["is_authentic"] == (r["is_watermarked"] and r["p_value"] <= r["alpha"])

    r2 = api.verify_array(wav, session, decoded ^ 0xFFFF)
    assert r2["bit_agreement"] == 0 and r2["p_value"] == 1.0
    assert not r2["is_authentic"] and r2["match_margin"] < 0


def test_verify_watermark_trained(tmp_path, trained_session):
    """End-to-end authentication: a file embedded with message M verifies as
    more significant against M than against a different message."""
    sess, batch = trained_session
    clip = np.concatenate([batch[i % 4] for i in range(3)])
    p = str(tmp_path / "c.wav")
    save_wav(p, clip, 16000)
    out = str(tmp_path / "w.wav")
    api.generate_watermarked_audio(p, sess, out, message=0xBEEF)
    r_right = api.verify_watermark(out, sess, 0xBEEF)
    r_wrong = api.verify_watermark(out, sess, 0xBEEF ^ 0xFFFF)
    # complement-message identities (hold regardless of model skill; the
    # skill claims live in the trained-run evidence, DEMO.md)
    assert r_right["bit_agreement"] + r_wrong["bit_agreement"] == 16
    np.testing.assert_allclose(
        r_right["match_margin"], -r_wrong["match_margin"], rtol=1e-6
    )
    assert r_right["decoded_message"] == r_wrong["decoded_message"]
    assert 0.0 < r_right["p_value"] <= 1.0


def test_run_inference_on_file(tmp_path, session):
    wav = np.random.default_rng(3).standard_normal(1700).astype(np.float32) * 0.1
    p = str(tmp_path / "x.wav")
    save_wav(p, wav, 16000)
    wm, prob, rms, snr = api.run_inference_on_file(p, session)
    assert wm.shape == (1700,)
    assert 0 <= prob <= 1 and rms > 0 and np.isfinite(snr)


def test_save_audio_quality(tmp_path):
    t = np.arange(16000) / 16000.0
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "q.wav")
    api.save_audio_quality(x, p)
    from awm_tpu.utils.audio_io import load_audio

    wav, sr = load_audio(p)
    assert sr == 16000 and wav.shape[1] == 16000


def test_folder_processors(tmp_path, session):
    rng = np.random.default_rng(5)
    in_dir = tmp_path / "in" / "sub"
    in_dir.mkdir(parents=True)
    for i in range(3):
        save_wav(str(in_dir / f"c{i}.wav"), rng.standard_normal(1200).astype(np.float32) * 0.1, 16000)
    stats = ev.embed_watermark_folder(str(tmp_path / "in"), str(tmp_path / "out"), session, seed=0)
    assert stats["n_files"] == 3 and stats["errors"] == 0
    assert os.path.exists(str(tmp_path / "out" / "sub" / "watermarked_c0.wav"))
    det = ev.detect_watermark_folder(str(tmp_path / "out"), session)
    assert det["n_files"] == 3


def test_evaluate_model_and_classifier(session):
    rng = np.random.default_rng(7)
    batches = [rng.standard_normal((4, CHUNK)).astype(np.float32) * 0.1 for _ in range(2)]
    m = ev.evaluate_model(session, batches)
    assert set(m) == {"watermarked_prob", "clean_prob", "bit_accuracy",
                      "bit_accuracy_mean_logit", "delta_rms"}
    cm, report = ev.evaluate_classifier(session, batches)
    assert cm.sum() == 16  # 2 batches x (4 wm + 4 clean)
    assert "watermarked" in report


def test_evaluate_corpus(tmp_path, session):
    rng = np.random.default_rng(9)
    d = tmp_path / "corpus"
    d.mkdir()
    for i in range(3):
        save_wav(str(d / f"f{i}.wav"), rng.standard_normal(1700).astype(np.float32) * 0.1, 16000)
    out = ev.evaluate_corpus(str(d), session, seed=0)
    assert out["n_files"] == 3 and out["errors"] == 0
    assert 0.0 <= out["auc"] <= 1.0
    assert isinstance(ev.interpret_results(out["accuracy"]), str)


def test_stoi_sanity(speechlike):
    from awm_tpu.dsp.stoi import stoi

    # identical signals -> ~1; heavy noise -> much lower; monotone in SNR
    x = np.tile(speechlike, 3)  # 3 s for enough segments
    rng = np.random.default_rng(0)
    clean = stoi(x, x, 16000)
    assert clean > 0.95
    n = rng.standard_normal(len(x)).astype(np.float32)
    sc = lambda snr_db: x + n * np.sqrt((x**2).mean() / (n**2).mean()) * 10 ** (-snr_db / 20)
    s20 = stoi(x, sc(20), 16000)
    s0 = stoi(x, sc(0), 16000)
    assert clean >= s20 >= s0
    assert s0 < 0.9


def test_nsim_quality(speechlike):
    from awm_tpu.dsp.quality import nsim_quality

    x = np.tile(speechlike, 3)
    rng = np.random.default_rng(0)
    assert nsim_quality(x, x, 16000) == pytest.approx(1.0, abs=1e-9)
    n = rng.standard_normal(len(x)).astype(np.float32)
    sc = lambda snr_db: x + n * np.sqrt((x**2).mean() / (n**2).mean()) * 10 ** (-snr_db / 20)
    s40, s20, s0 = (nsim_quality(x, sc(s), 16000) for s in (40, 20, 0))
    assert 1.0 > s40 > s20 > s0  # monotone in SNR
    assert s40 > 0.97  # near-transparent perturbation scores near 1
    assert s0 < 0.9
    # watermark-scale delta (RMS ~0.0086, the reference's -42 dBFS level,
    # BASELINE.md) must be scored as perceptually transparent
    d = rng.standard_normal(len(x)).astype(np.float32)
    d *= 0.0086 / np.sqrt((d**2).mean())
    assert nsim_quality(x, x + d, 16000) > 0.95


def test_nsim_golden_regression():
    """Pinned values on deterministic inputs — regression guard for the
    gammatone banding + NSIM math (no external package exists in this image
    to cross-check against, so the guard is self-consistency over time)."""
    from awm_tpu.dsp.quality import nsim_quality

    fs = 16000
    t = np.arange(2 * fs) / fs
    rng = np.random.default_rng(42)
    x = (0.3 * np.sin(2 * np.pi * 220 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))).astype(
        np.float64
    )
    noise = 0.01 * rng.standard_normal(2 * fs)
    # a pure tone has near-floor energy in most bands, so -30 dB noise is
    # (correctly) scored as clearly audible against it
    got = nsim_quality(x, x + noise, fs)
    assert got == pytest.approx(0.4497, abs=2e-3)
    smooth = np.convolve(x + noise, np.ones(5) / 5, "same")
    assert nsim_quality(x, smooth, fs) == pytest.approx(0.4870, abs=2e-3)


def test_evaluate_robustness(trained_session):
    sess, batch = trained_session
    table = ev.evaluate_robustness(sess, batch, seed=0)
    assert "none" in table and "lowpass_7k" in table
    for name, row in table.items():
        assert 0.0 <= row["wm_prob"] <= 1.0, name
        assert 0.0 <= row["detect_rate"] <= 1.0
    # unattacked watermark must be detected better than clean
    assert table["none"]["wm_prob"] > table["none"]["clean_prob"]
    # per-attack AUC present and sane; on the unattacked channel the ranking
    # must be far better than chance for a trained session
    for name, row in table.items():
        assert 0.0 <= row["auc"] <= 1.0, name
        assert 0.0 <= row["calibrated_threshold"] <= 1.0, name
        assert 0.0 <= row["detect_rate_calibrated"] <= 1.0, name
        assert 0.0 <= row["fpr_calibrated"] <= 1.0, name
        # message survival under the channel (mean-logit decode rule)
        assert 0.0 <= row["bit_accuracy"] <= 1.0, name
    assert table["none"]["auc"] > 0.9
    # held-out calibrated operating point on the unattacked channel must
    # separate a trained session well
    assert table["none"]["detect_rate_calibrated"] > 0.9
    assert table["none"]["fpr_calibrated"] < 0.1


def test_evaluate_robustness_ecc(trained_session):
    """ecc=True embeds SECDED codewords and reports message-exact rates:
    correcting one flipped bit can only help, so exact_rate_ecc >=
    exact_rate_raw on every channel, and flagged decodes are the visible
    complement of trusted ones."""
    sess, batch = trained_session
    table = ev.evaluate_robustness(
        sess, batch, seed=0, ecc=True,
        attacks={"none": lambda x: x, "volume_0.5": lambda x: x * 0.5},
    )
    for name, row in table.items():
        assert 0.0 <= row["exact_rate_raw"] <= 1.0, name
        assert row["exact_rate_ecc"] >= row["exact_rate_raw"], name
        assert 0.0 <= row["ecc_flagged_rate"] <= 1.0, name
        # a trusted (ok=True) decode and a flagged one are disjoint events
        assert row["exact_rate_ecc"] + row["ecc_flagged_rate"] <= 1.0 + 1e-9, name


def test_optimal_threshold():
    labels = [1, 1, 1, 0, 0, 0]
    probs = [0.40, 0.45, 0.48, 0.10, 0.15, 0.20]  # separable, all below 0.5
    cal = ev.optimal_threshold(labels, probs)
    assert cal["tpr"] == 1.0 and cal["fpr"] == 0.0 and cal["j"] == 1.0
    assert cal["auc"] == 1.0
    # strict-> decision at the returned threshold reproduces tpr/fpr exactly
    assert 0.20 < cal["threshold"] < 0.40
    p = np.asarray(probs)
    assert (p[:3] > cal["threshold"]).all() and not (p[3:] > cal["threshold"]).any()


def test_optimal_threshold_saturated():
    """All-confident detector: the '>=' ROC point is a sample score (1.0);
    the midpoint shift keeps the strict-> rule from dropping every positive."""
    cal = ev.optimal_threshold([1, 1, 0, 0], [1.0, 1.0, 0.0, 0.0])
    assert cal["tpr"] == 1.0 and cal["fpr"] == 0.0
    assert (np.asarray([1.0, 1.0]) > cal["threshold"]).all()
    assert not (np.asarray([0.0, 0.0]) > cal["threshold"]).any()


def test_shaping_session_enforces_rms_cap(tmp_path):
    """A shaping-enabled config (main16 limit_rms, ref: py/main16.py:69-72)
    must (a) cap every embedded delta's RMS at inference by construction,
    (b) record the chain in the checkpoint's arch sidecar, and (c) be
    reconstructed by the CLI loader so the cap survives a save/load cycle."""
    from awm_tpu import checkpoint as ck
    from awm_tpu.config import ShapingConfig

    cap = 0.003
    cfg = dataclasses.replace(
        get_config("base"),
        audio_len=CHUNK,
        shaping=ShapingConfig(enabled=True, max_rms=cap),
    )
    state, gen, det = tr.init_state(cfg, jax.random.key(3))
    sess = api.InferenceSession.from_state(cfg, gen, det, state)
    rng = np.random.default_rng(2)
    clips = (0.3 * rng.standard_normal((8, CHUNK))).astype(np.float32)
    msgs = rng.integers(0, 2**16, size=8).astype(np.int32)
    delta = np.asarray(sess.embed_chunks(clips, msgs))
    rms = np.sqrt((delta**2).mean(axis=-1))
    assert (rms <= cap * 1.001).all(), rms

    # un-shaped session from the same weights exceeds the cap (init-scale
    # deltas are large), proving the cap comes from the shaping chain
    plain = api.InferenceSession.from_state(
        dataclasses.replace(cfg, shaping=ShapingConfig()), gen, det, state
    )
    rms_plain = np.sqrt((np.asarray(plain.embed_chunks(clips, msgs)) ** 2).mean(-1))
    assert rms_plain.max() > cap

    # sidecar round trip
    p = str(tmp_path / "ckpt")
    ck.save_checkpoint(p, state, model_cfg=cfg.model, shaping_cfg=cfg.shaping)
    arch = ck.read_arch(p)
    assert arch["shaping"]["enabled"] and arch["shaping"]["max_rms"] == cap
    rebuilt = ShapingConfig(**arch["shaping"])
    assert rebuilt == cfg.shaping
