"""Dataset-prep tool + CLI tests (ref: dataset_creation/*, SURVEY.md 2.3)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from awm_tpu.data import prep
from awm_tpu.utils.audio_io import save_wav


@pytest.fixture
def corpus(tmp_path, rng):
    d = tmp_path / "raw"
    d.mkdir()
    t = np.arange(32000) / 16000.0
    # speech-like: modulated low tone; noise-like: white noise
    speech = (0.4 * np.sin(2 * np.pi * 200 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 4 * t))).astype(np.float32)
    # make it peaky (high kurtosis) like speech
    speech = speech * (np.abs(speech) > 0.2)
    noise = (0.3 * rng.standard_normal(32000)).astype(np.float32)
    silent = np.zeros(16000, np.float32)
    save_wav(str(d / "speech.wav"), speech, 16000)
    save_wav(str(d / "noise.wav"), noise, 16000)
    save_wav(str(d / "silent.wav"), silent, 16000)
    return str(d)


def test_metadata_select_compare(tmp_path, corpus):
    meta = str(tmp_path / "meta.csv")
    n = prep.build_metadata(corpus, meta, exts=(".wav",))
    assert n == 3
    rows = prep.read_metadata(meta)
    assert all(abs(dur - (2.0 if "speech" in p or "noise" in p else 1.0)) < 0.01 for p, dur in rows)

    sel = str(tmp_path / "sel.csv")
    k, total = prep.select_audios(meta, sel, seconds=3.0, seed=1)
    assert total >= 3.0 and k >= 2

    cmp_out = prep.compare_metadata(meta, sel)
    assert cmp_out["overlap"] == k


def test_segment_to_clips(tmp_path, corpus):
    files = [os.path.join(corpus, "speech.wav"), os.path.join(corpus, "noise.wav")]
    out = str(tmp_path / "clips")
    n = prep.segment_to_clips(files, out, workers=2)
    assert n == 4  # two 2-s files -> 2 clips each
    import glob

    clips = glob.glob(os.path.join(out, "*.wav"))
    assert len(clips) == 4
    from awm_tpu.utils.audio_io import load_audio

    wav, sr = load_audio(clips[0])
    assert sr == 16000 and wav.shape[1] == 16000
    # peak-normalized to ~0.99 across the source file
    peaks = [np.abs(load_audio(c)[0]).max() for c in sorted(clips)]
    assert max(peaks) > 0.9

    # per-file subdirs variant (100_sub.py)
    out2 = str(tmp_path / "clips2")
    prep.segment_to_clips(files, out2, per_file_subdirs=True, workers=1)
    assert os.path.isdir(os.path.join(out2, "speech"))


def test_classifier_separates_speech_noise(corpus, tmp_path):
    f_speech = prep.analyze_audio(os.path.join(corpus, "speech.wav"))
    f_noise = prep.analyze_audio(os.path.join(corpus, "noise.wav"))
    assert prep.classify_speech_noise(f_speech) == "speech"
    assert prep.classify_speech_noise(f_noise) == "noise"
    assert prep.classify_speech_noise({"error": "x"}) == "error"

    out = str(tmp_path / "cls")
    stats = prep.classify_folder(corpus, out, workers=2)
    assert stats["speech"] >= 1 and stats["noise"] >= 1
    assert os.path.exists(os.path.join(out, "audio_classification_results.csv"))
    speech_list = os.path.join(out, "speech_files.txt")
    assert os.path.exists(speech_list)

    dest = str(tmp_path / "speech_only")
    n = prep.copy_speech_only(speech_list, dest)
    assert n >= 1 and len(os.listdir(dest)) == n


def test_find_silent(corpus):
    silent = prep.find_silent(corpus)
    assert len(silent) == 1 and "silent.wav" in silent[0]


# -- CLI -------------------------------------------------------------------


def _run_cli(*args):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/awm_tpu_test_cache",
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.5")
    return subprocess.run(
        [sys.executable, "-m", "awm_tpu", *args],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=500,
    )


def test_cli_prep_and_help(tmp_path, corpus):
    r = _run_cli("--help")
    assert r.returncode == 0 and "embed" in r.stdout and "prep" in r.stdout

    meta = str(tmp_path / "m.csv")
    r = _run_cli("prep", "metadata", corpus, meta)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(meta)

    r = _run_cli("prep", "silent", corpus)
    assert r.returncode == 0 and "silent.wav" in r.stdout


def test_cli_embed_detect_roundtrip(tmp_path, rng):
    clip = (0.2 * rng.standard_normal(24000)).astype(np.float32)
    src = str(tmp_path / "in.wav")
    save_wav(src, clip, 16000)
    out = str(tmp_path / "out.wav")
    # --platform cpu: the image's sitecustomize forces a TPU plugin on
    # subprocesses; --audio-len keeps the CPU LSTM scan short
    r = _run_cli("--platform", "cpu", "embed", src, out, "--audio-len", "800", "--seed", "0")
    assert r.returncode == 0, r.stderr
    metrics = json.loads(r.stdout)
    assert os.path.exists(out) and "watermark_rms" in metrics

    r = _run_cli("--platform", "cpu", "detect", out, "--audio-len", "800")
    assert r.returncode == 0, r.stderr
    d = json.loads(r.stdout)
    assert "mean_probability" in d and d["decision"] in ("WATERMARKED", "NOT WATERMARKED")


def test_load_session_dtype_defaults(monkeypatch):
    """--torch-* imports must default to fp32 compute (strict checkpoint
    parity, round-1 regression); --compute-dtype overrides either way."""
    import argparse

    import jax
    import jax.numpy as jnp

    from awm_tpu import __main__ as cli
    from awm_tpu import checkpoint as ck
    from awm_tpu import train as tr
    from awm_tpu.config import get_config

    base = dict(preset="base", audio_len=512, ckpt=None,
                torch_generator=None, torch_detector=None, compute_dtype=None)
    assert cli._load_session(argparse.Namespace(**base)).compute_dtype == jnp.bfloat16

    state, _, _ = tr.init_state(get_config("base"), jax.random.key(0))
    fresh_dvars = {"params": state.params["det"],
                   "batch_stats": state.batch_stats["det"]}
    monkeypatch.setattr(ck, "import_torch_detector", lambda p: fresh_dvars)

    s = cli._load_session(argparse.Namespace(**{**base, "torch_detector": "x.pth"}))
    assert s.compute_dtype == jnp.float32

    s = cli._load_session(argparse.Namespace(
        **{**base, "torch_detector": "x.pth", "compute_dtype": "bfloat16"}))
    assert s.compute_dtype == jnp.bfloat16


def test_load_session_sidecar_autoconfig_and_conflict(tmp_path):
    """Self-describing checkpoints at the CLI: _load_session adopts the
    recorded architecture (no flags needed), accepts matching flags, and
    fails fast on conflicting ones — for every recorded variant axis
    including delta_band_hz."""
    import argparse
    import dataclasses as dc

    import jax
    import pytest

    from awm_tpu import __main__ as cli
    from awm_tpu import checkpoint as ck
    from awm_tpu import train as tr
    from awm_tpu.config import get_config

    cfg = dc.replace(get_config("base"), audio_len=512)
    variant = dc.replace(cfg, model=dc.replace(
        cfg.model, message_encoding="bits", decode_head="dilated",
        delta_band_hz=3000.0))
    state, _, _ = tr.init_state(variant, jax.random.key(0))
    p = str(tmp_path / "ckpt_best")
    ck.save_checkpoint(p, state, epoch=1, best_val=9.0, model_cfg=variant.model)

    base = dict(preset="base", audio_len=512, ckpt=p,
                torch_generator=None, torch_detector=None, compute_dtype=None,
                message_encoding=None, decode_head=None, delta_band_hz=None)
    s = cli._load_session(argparse.Namespace(**base))
    # auto-configured from the sidecar, no flags given
    assert s.gen.message_encoding == "bits"
    assert s.gen.delta_band_hz == 3000.0
    assert s.det.decode_head == "dilated"

    # matching explicit flags validate and pass
    s = cli._load_session(argparse.Namespace(
        **{**base, "delta_band_hz": 3000.0, "decode_head": "dilated"}))
    assert s.gen.delta_band_hz == 3000.0

    # conflicting flags fail fast instead of silently mis-building the model
    with pytest.raises(SystemExit, match="delta-band-hz"):
        cli._load_session(argparse.Namespace(**{**base, "delta_band_hz": 2000.0}))
    with pytest.raises(SystemExit, match="decode-head"):
        cli._load_session(argparse.Namespace(**{**base, "decode_head": "shared"}))


# -- full noise.py feature set (ref: dataset_creation/noise.py:10-90) --------


def test_dct_ortho_matches_scipy():
    from scipy.fft import dct as scipy_dct

    from awm_tpu.data.prep import _dct_ortho

    rng = np.random.default_rng(0)
    x = rng.standard_normal((128, 7))
    ours = _dct_ortho(x, 13)
    ref = scipy_dct(x, type=2, norm="ortho", axis=0)[:13]
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_mel_scale_inverse_and_filterbank():
    from awm_tpu.data.prep import _hz_to_mel, _mel_to_hz, _mel_filterbank

    f = np.array([0.0, 250.0, 999.0, 1000.0, 4000.0, 8000.0])
    np.testing.assert_allclose(_mel_to_hz(_hz_to_mel(f)), f, rtol=1e-9)
    fb = _mel_filterbank(16000, 2048, n_mels=128)
    assert fb.shape == (128, 1025)
    assert (fb >= 0).all()
    # triangle peaks move monotonically up in frequency
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all() and peaks[-1] > peaks[0]


def test_framewise_spectral_features_on_tones(rng):
    """Centroid/rolloff of a pure tone sit at the tone; bandwidth of a tone
    is far below white noise's."""
    from awm_tpu.data.prep import full_spectral_features

    sr = 16000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    noise = (0.3 * rng.standard_normal(sr)).astype(np.float32)
    ft = full_spectral_features(tone, sr)
    fn = full_spectral_features(noise, sr)
    assert abs(ft["spectral_centroid"] - 1000) < 60, ft["spectral_centroid"]
    assert abs(ft["rolloff"] - 1000) < 60, ft["rolloff"]
    assert ft["spectral_bandwidth"] < 0.25 * fn["spectral_bandwidth"]
    assert fn["spectral_centroid"] > 2500  # white noise centroid ~ sr/4


def test_mfcc_separates_speech_from_noise(corpus):
    """MFCC variance over time is higher for AM-modulated speech-like audio
    than for stationary noise (the reference logs these stats per file)."""
    from awm_tpu.data.prep import analyze_audio

    speech = analyze_audio(os.path.join(corpus, "speech.wav"), full=True)
    noise = analyze_audio(os.path.join(corpus, "noise.wav"), full=True)
    for k in ("spectral_bandwidth", "rolloff", "mfcc_mean", "mfcc_var"):
        assert k in speech and np.isfinite(speech[k]), k
    assert speech["mfcc_var"] > noise["mfcc_var"]


def test_classify_folder_full_mode(corpus, tmp_path):
    from awm_tpu.data.prep import classify_folder

    out = classify_folder(corpus, str(tmp_path / "full"), workers=2, full=True)
    assert out["speech"] >= 1 and out["noise"] >= 1
    header = open(str(tmp_path / "full" / "audio_classification_results.csv")).readline()
    for col in ("spectral_bandwidth", "rolloff", "mfcc_mean", "mfcc_var"):
        assert col in header, col


def test_sample_feature_stats(corpus):
    """--sample tuning mode: per-feature describe() stats + tally
    (ref: dataset_creation/noise.py:245-270)."""
    from awm_tpu.data.prep import sample_feature_stats

    stats = sample_feature_stats(corpus, 3, full=True)
    assert stats["_classification"]["speech"] >= 1
    for feat in ("energy", "spectral_centroid", "mfcc_var"):
        assert {"count", "mean", "std", "min", "max"} <= set(stats[feat]), feat
        assert np.isfinite(stats[feat]["mean"])


def test_cli_train_augment_smoke(tmp_path):
    """train --augment/--lr/--patience: the robustness curriculum is
    reachable from the CLI (round-1 study required the Python API)."""
    r = _run_cli(
        "--platform", "cpu", "train", "--synthetic-n", "16", "--batch-size", "4",
        "--epochs", "1", "--audio-len", "512", "--augment", "--attack-prob", "0.5",
        "--noise-snr", "12,38", "--lr", "1e-3", "--patience", "2",
        "--ckpt-dir", str(tmp_path / "ck"),
    )
    assert r.returncode == 0, r.stderr
    assert "best_val" in r.stdout
    assert os.path.isdir(str(tmp_path / "ck" / "ckpt_best"))


def test_cli_train_loss_weights(tmp_path):
    """--loss-weights overrides per-term lambdas; bad term names fail fast."""
    r = _run_cli(
        "--platform", "cpu", "train", "--synthetic-n", "16", "--batch-size", "4",
        "--epochs", "1", "--audio-len", "512", "--loss-weights", "dec=5,l1=0.2",
        "--select-metric", "dec", "--ckpt-dir", str(tmp_path / "ck"),
    )
    assert r.returncode == 0, r.stderr
    assert os.path.isdir(str(tmp_path / "ck" / "ckpt_best"))
    r = _run_cli("--platform", "cpu", "train", "--synthetic-n", "16",
                 "--loss-weights", "bogus=1")
    assert r.returncode != 0
    assert "loss-weights" in r.stderr


def test_cli_train_dec_bit_balance(tmp_path):
    """--dec-bit-balance trains end-to-end with --dec-loss mean and fails
    fast without it (the per-bit weights are defined on the time-mean
    statistic, losses.dec_loss)."""
    r = _run_cli(
        "--platform", "cpu", "train", "--synthetic-n", "16", "--batch-size", "4",
        "--epochs", "1", "--audio-len", "512", "--message-encoding", "bits",
        "--dec-loss", "mean", "--dec-bit-balance", "1.0",
        "--ckpt-dir", str(tmp_path / "ck"),
    )
    assert r.returncode == 0, r.stderr
    assert os.path.isdir(str(tmp_path / "ck" / "ckpt_best"))
    r = _run_cli("--platform", "cpu", "train", "--synthetic-n", "16",
                 "--dec-bit-balance", "1.0")
    assert r.returncode != 0
    assert "dec-bit-balance" in r.stderr


def test_cli_embed_with_trained_ckpt(tmp_path, rng):
    """--ckpt inference loads a checkpoint trained under a DIFFERENT
    preset's optimizer (params-only restore, checkpoint.restore_params):
    train with onecycle20's schedule, embed with the default base preset."""
    r = _run_cli(
        "--platform", "cpu", "train", "--preset", "onecycle20",
        "--synthetic-n", "16", "--batch-size", "4", "--epochs", "1",
        "--audio-len", "512", "--ckpt-dir", str(tmp_path / "ck"),
    )
    assert r.returncode == 0, r.stderr
    src = str(tmp_path / "in.wav")
    out = str(tmp_path / "wm.wav")
    save_wav(src, (0.1 * rng.standard_normal(1600)).astype(np.float32), 16000)
    r = _run_cli(
        "--platform", "cpu", "embed", src, out, "--audio-len", "512",
        "--ckpt", str(tmp_path / "ck" / "ckpt_best"), "--seed", "0",
    )
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out)


def test_cli_train_seed_override(tmp_path):
    """--seed drives init/split/shuffle: two seeds land at different best_val
    (training-seed variance needs this knob; VERDICT round-2 item 4)."""
    outs = []
    for seed in (0, 1):
        r = _run_cli(
            "--platform", "cpu", "train", "--synthetic-n", "16",
            "--batch-size", "4", "--epochs", "1", "--audio-len", "512",
            "--seed", str(seed), "--ckpt-dir", str(tmp_path / f"s{seed}"),
        )
        assert r.returncode == 0, r.stderr
        outs.append(json.loads(r.stdout[r.stdout.index("{"):])["best_val"])
    assert outs[0] != outs[1]


def test_cli_curriculum_smoke(tmp_path):
    """curriculum robust_decode --smoke: the 4-leg flagship recipe runs end
    to end as ONE command, each leg fine-tuning the previous leg's best
    checkpoint; finished legs are skipped on re-run (.done markers)."""
    out = str(tmp_path / "cur")
    args = ("--platform", "cpu", "curriculum", "robust_decode", "--out", out,
            "--synthetic-n", "16", "--batch-size", "4", "--audio-len", "512",
            "--music-frac", "0.25", "--smoke")
    r = _run_cli(*args)
    assert r.returncode == 0, r.stderr
    tail = json.loads(r.stdout[r.stdout.rindex('{\n  "recipe"'):])
    assert list(tail["legs"]) == ["A_shared", "B_dilated", "C_robust",
                                  "D2_budget", "E2_balance", "F2_tighten",
                                  "G2_tighten", "H2_tighten"]
    for name in tail["legs"]:
        assert os.path.isdir(os.path.join(out, name, "ckpt_best")), name
        assert os.path.isfile(os.path.join(out, name, ".done")), name
    assert tail["final_ckpt"] == os.path.join(out, "H2_tighten", "ckpt_best")
    # balance/tighten legs override the environment back to the bl
    # configuration (round-5 probe matrix: music mix + 3-rate resample
    # starve weak bit carriers; evidence/r5/winner.json) — the override is
    # appended last so it wins argparse's last-occurrence rule
    e2_cmd = [l for l in r.stdout.splitlines()
              if l.startswith("== curriculum leg E2_balance:")][0]
    assert e2_cmd.rstrip().endswith("metrics.csv")
    assert "--music-frac 0.25" in e2_cmd and "--music-frac 0.0" in e2_cmd
    assert e2_cmd.index("--music-frac 0.25") < e2_cmd.index("--music-frac 0.0")
    assert "--resample-hz 8000,11025,22050" in e2_cmd
    assert e2_cmd.index("22050") < e2_cmd.index("--resample-hz 8000 ")
    c_cmd = [l for l in r.stdout.splitlines()
             if l.startswith("== curriculum leg C_robust:")][0]
    assert "--music-frac 0.0" not in c_cmd  # C keeps the full environment
    # the final leg's checkpoint is the full decode arch (sidecar says so)
    arch = json.load(open(os.path.join(out, "H2_tighten", "ckpt_best",
                                       "awm_arch.json")))
    assert arch["decode_head"] == "dilated"
    assert arch["message_encoding"] == "bits"
    # re-run: every leg skips
    r = _run_cli(*args)
    assert r.returncode == 0, r.stderr
    assert r.stdout.count("already done, skipping") == 8


def test_cli_curriculum_stop_after(tmp_path):
    """--stop-after: drivers interleave evals/evidence commits between legs
    (tools/r3_run.sh); unknown leg names fail loudly before any training."""
    out = str(tmp_path / "cur")
    # pre-mark the first leg done so no training happens: the run must stop
    # after it instead of continuing to B_dilated
    os.makedirs(os.path.join(out, "A_shared"))
    open(os.path.join(out, "A_shared", ".done"), "w").close()
    r = _run_cli("--platform", "cpu", "curriculum", "robust_decode",
                 "--out", out, "--synthetic-n", "16", "--batch-size", "4",
                 "--audio-len", "512", "--smoke", "--stop-after", "A_shared")
    assert r.returncode == 0, r.stderr
    tail = json.loads(r.stdout[r.stdout.rindex('{\n  "recipe"'):])
    assert list(tail["legs"]) == ["A_shared"]
    assert not os.path.exists(os.path.join(out, "B_dilated"))

    r = _run_cli("--platform", "cpu", "curriculum", "robust_decode",
                 "--out", out, "--smoke", "--stop-after", "nope")
    assert r.returncode != 0
    assert "not a leg" in r.stderr
