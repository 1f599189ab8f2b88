"""Native C++ WAV loader tests: build, decode parity vs the Python reader,
batch loading through BatchLoader, error handling."""

import os

import numpy as np
import pytest

from awm_tpu.data import native
from awm_tpu.data.dataset import BatchLoader, OneSecClips
from awm_tpu.utils.audio_io import load_audio, save_wav

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader not built (no g++?)"
)


@pytest.fixture
def wavs(tmp_path, rng):
    d = tmp_path / "w"
    d.mkdir()
    paths = []
    # mono 16k exact length
    x0 = (0.5 * rng.standard_normal(16000)).astype(np.float32).clip(-1, 1)
    save_wav(str(d / "a.wav"), x0, 16000)
    # stereo 16k long
    x1 = (0.5 * rng.standard_normal((2, 20000))).astype(np.float32).clip(-1, 1)
    save_wav(str(d / "b.wav"), x1, 16000)
    # mono 22050 short — band-limited (a tone): linear resample only matches
    # the polyphase path on band-limited content, which real speech is
    x2 = (0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / 22050)).astype(np.float32)
    save_wav(str(d / "c.wav"), x2, 22050)
    paths = [str(d / n) for n in ("a.wav", "b.wav", "c.wav")]
    return paths, (x0, x1, x2), str(d)


def test_native_batch_decode_matches_python(wavs):
    paths, (x0, x1, x2), _ = wavs
    out, ok = native.load_clips(paths, clip_len=16000, target_sr=16000, n_threads=4)
    assert out.shape == (3, 16000) and ok.all()
    # exact for the mono/16k file (round-trip through int16)
    ref0, _ = load_audio(paths[0])
    np.testing.assert_allclose(out[0], ref0[0], atol=1e-6)
    # stereo mono-mix + truncate
    ref1, _ = load_audio(paths[1])
    np.testing.assert_allclose(out[1], ref1.mean(axis=0)[:16000], atol=1e-6)
    # 22050->16000 linear resample: correlated with polyphase python path
    from awm_tpu.utils.audio_io import resample, to_mono

    ref2 = resample(to_mono(load_audio(paths[2])[0]), 22050, 16000)
    n = min(len(ref2), 16000)
    got = out[2][: n - 16]
    want = ref2[: n - 16]
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.95
    # zero-padded past the resampled extent
    assert out[2][int(8000 * 16000 / 22050) + 2 :].sum() == 0


def test_native_bad_file_skip(tmp_path, wavs):
    paths, _, _ = wavs
    bad = str(tmp_path / "bad.wav")
    open(bad, "wb").write(b"not a wav at all")
    out, ok = native.load_clips([paths[0], bad], clip_len=16000, target_sr=16000)
    assert ok.tolist() == [True, False]
    assert out[1].sum() == 0


def test_batch_loader_native_path(wavs):
    _, _, d = wavs
    ds = OneSecClips(d)
    loader = BatchLoader(ds, batch_size=3, shuffle=False, drop_last=False, native=True)
    assert loader._native
    (batch,) = list(loader)
    # python path must agree
    loader_py = BatchLoader(ds, batch_size=3, shuffle=False, drop_last=False, native=False)
    (batch_py,) = list(loader_py)
    # resampled file differs slightly (linear vs polyphase); exact for 16k files
    order = [os.path.basename(p) for p in ds.filepaths]
    for i, name in enumerate(order):
        if name == "c.wav":
            assert np.corrcoef(batch[i][:5000], batch_py[i][:5000])[0, 1] > 0.95
        else:
            np.testing.assert_allclose(batch[i], batch_py[i], atol=1e-6)
