"""WAV I/O round-trip and resample tests (ref load/save semantics:
py/main14.py:601-607, py/main15.py:850-867)."""

import numpy as np

from awm_tpu.utils import audio_io


def test_wav_roundtrip_mono(tmp_path, speechlike):
    p = str(tmp_path / "a.wav")
    audio_io.save_wav(p, speechlike, 16000)
    wav, sr = audio_io.load_audio(p)
    assert sr == 16000
    assert wav.shape == (1, 16000)
    # save scales by 32767, load by 32768 (torchaudio-identical asymmetry)
    np.testing.assert_allclose(wav[0], speechlike, atol=1e-4)


def test_wav_roundtrip_stereo(tmp_path, rng):
    x = (0.5 * rng.standard_normal((2, 8000))).astype(np.float32).clip(-1, 1)
    p = str(tmp_path / "s.wav")
    audio_io.save_wav(p, x, 22050)
    wav, sr = audio_io.load_audio(p)
    assert sr == 22050 and wav.shape == (2, 8000)
    np.testing.assert_allclose(wav, x, atol=1e-4)
    mono = audio_io.to_mono(wav)
    np.testing.assert_allclose(mono, wav.mean(axis=0))


def test_resample_tone_preserved():
    sr_in, sr_out = 22050, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = audio_io.resample(x, sr_in, sr_out)
    assert abs(len(y) - sr_out) <= 1
    # dominant frequency still 440 Hz
    f = np.fft.rfftfreq(len(y), 1 / sr_out)
    peak = f[np.abs(np.fft.rfft(y)).argmax()]
    assert abs(peak - 440.0) < 2.0


def test_load_mono_16k_end_to_end(tmp_path, rng):
    x = (0.3 * rng.standard_normal((2, 44100))).astype(np.float32).clip(-1, 1)
    p = str(tmp_path / "m.wav")
    audio_io.save_wav(p, x, 44100)
    y = audio_io.load_mono_16k(p)
    assert y.ndim == 1
    assert abs(len(y) - 16000) <= 2


def test_in_memory_wav_codec_roundtrip():
    """decode_wav_bytes/encode_wav_bytes (the zero-temp-file serving path)
    agree exactly with the file-based save_wav/load_audio pair."""
    import os
    import tempfile

    from awm_tpu.utils.audio_io import (
        decode_wav_bytes,
        encode_wav_bytes,
        load_audio,
        save_wav,
    )

    rng = np.random.default_rng(0)
    x = (0.5 * rng.standard_normal((2, 1234))).astype(np.float32).clip(-1, 1)
    blob = encode_wav_bytes(x, 16000)
    assert blob[:4] == b"RIFF"
    wav, sr = decode_wav_bytes(blob)
    assert sr == 16000 and wav.shape == x.shape
    # save scales by 32767, load by 32768 (torchaudio-identical asymmetry)
    np.testing.assert_allclose(wav, x, atol=1e-4)

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.wav")
        save_wav(p, x, 16000)
        via_file, sr2 = load_audio(p)
        assert open(p, "rb").read() == blob  # identical encoder
    np.testing.assert_array_equal(via_file, wav)
