"""Golden tests for the DSP core against scipy and torch (CPU).

The reference's spectral conventions come from torch.stft / torchaudio
MelSpectrogram (ref: py/main14.py:154-179); torch (CPU) is available in the
image, so STFT parity is checked directly against torch.stft.  Filter and
metric semantics are checked against scipy and hand-derived values.
"""

import os

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from awm_tpu import dsp


def test_hann_window_matches_torch_periodic():
    import torch

    ours = np.asarray(dsp.hann_window(1024))
    ref = torch.hann_window(1024).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_frame_shapes_and_content(speechlike):
    frames = np.asarray(dsp.frame(jnp.asarray(speechlike), 1024, 256))
    assert frames.shape == ((16000 - 1024) // 256 + 1, 1024)
    np.testing.assert_allclose(frames[3], speechlike[3 * 256 : 3 * 256 + 1024])


@pytest.mark.parametrize("n_fft,hop", [(1024, 256), (2048, 512), (512, 128)])
def test_stft_matches_torch(speechlike, n_fft, hop):
    import torch

    ours = np.asarray(dsp.stft(jnp.asarray(speechlike), n_fft, hop))
    ref = torch.stft(
        torch.from_numpy(speechlike),
        n_fft,
        hop,
        window=torch.hann_window(n_fft),
        return_complex=True,
    ).numpy()
    # ours is (frames, freq); torch is (freq, frames)
    assert ours.shape == ref.T.shape
    np.testing.assert_allclose(ours, ref.T, atol=2e-4)


def test_mel_filterbank_properties():
    fb = dsp.mel_filterbank(513, 64, 16000)
    assert fb.shape == (513, 64)
    assert (fb >= 0).all()
    # Each filter is a triangle: single contiguous support, unit-free peak.
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) > 0).all()  # centers strictly increasing
    # HTK mel midpoint sanity: mel(1000 Hz) ~ 999.99
    assert abs(dsp.hz_to_mel(1000.0) - 999.9855) < 1e-2


def test_mel_spectrogram_power_and_shape(speechlike):
    mel = np.asarray(dsp.mel_spectrogram(jnp.asarray(speechlike)))
    assert mel.shape == (63, 64)  # center=True: 16000//256 + 1 frames
    assert (mel >= 0).all()
    # Energy concentrated below 1 kHz for the test tone stack.
    assert mel[:, :16].sum() > 5 * mel[:, 32:].sum()


def test_fir_lowpass_frequency_response(speechlike):
    # 500 Hz tone passes, 6 kHz tone is strongly attenuated (cutoff 4 kHz).
    t = np.arange(16000) / 16000.0
    lo = np.sin(2 * np.pi * 500 * t).astype(np.float32)
    hi = np.sin(2 * np.pi * 6000 * t).astype(np.float32)
    lo_out = np.asarray(dsp.fir_lowpass(jnp.asarray(lo)))
    hi_out = np.asarray(dsp.fir_lowpass(jnp.asarray(hi)))
    assert lo_out.shape == lo.shape
    assert np.sqrt((lo_out**2).mean()) > 0.9 * np.sqrt((lo**2).mean())
    assert np.sqrt((hi_out**2).mean()) < 0.02 * np.sqrt((hi**2).mean())


def test_fir_kernel_matches_reference_formula():
    # Independent check of the windowed-sinc construction vs scipy.firwin
    # (Hamming window, same cutoff) — shapes agree to ~1e-3 after norm.
    k = dsp.sinc_lowpass_kernel(4000.0, 101, 16000)
    ref = scipy.signal.firwin(101, 4000.0, window="hamming", fs=16000)
    ref = ref / ref.sum()
    np.testing.assert_allclose(k, ref, atol=2e-3)
    assert abs(k.sum() - 1.0) < 1e-6


def test_lowpass_biquad_matches_scipy_lfilter(speechlike):
    b0, b1, b2, a1, a2 = dsp.lowpass_biquad_coeffs(7000.0, 16000)
    ref = scipy.signal.lfilter([b0, b1, b2], [1.0, a1, a2], speechlike)
    ours = np.asarray(dsp.lowpass_biquad(jnp.asarray(speechlike), 16000, 7000.0))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_lowpass_biquad_matches_torchaudio_formula():
    # Coefficients must equal the audio-EQ-cookbook values torchaudio uses.
    b0, b1, b2, a1, a2 = dsp.lowpass_biquad_coeffs(7000.0, 16000, 0.707)
    import math

    w0 = 2 * math.pi * 7000.0 / 16000
    alpha = math.sin(w0) / (2 * 0.707)
    a0 = 1 + alpha
    assert abs(b0 - (1 - math.cos(w0)) / 2 / a0) < 1e-12
    assert abs(a1 - (-2 * math.cos(w0)) / a0) < 1e-12


def test_si_snr_basic_identities(speechlike):
    x = jnp.asarray(speechlike)
    # identical signals -> very large SI-SNR
    assert float(dsp.si_snr(x, x)) > 60.0
    # known-noise case: 20 dB SNR additive noise ~ 20 dB SI-SNR
    rng = np.random.default_rng(0)
    noise = rng.standard_normal(16000).astype(np.float32)
    noise *= np.sqrt((speechlike**2).mean() / (noise**2).mean()) / 10.0
    got = float(dsp.si_snr(x, x + jnp.asarray(noise)))
    assert 19.0 < got < 21.0
    # scale invariance (same additive perturbation, scaled jointly)
    b = float(dsp.si_snr(3.0 * x, 3.0 * (x + jnp.asarray(noise))))
    assert abs(got - b) < 0.2


def test_quantize_int16_roundtrip():
    x = jnp.asarray(np.linspace(-1, 1, 1001, dtype=np.float32))
    q = np.asarray(dsp.quantize_int16(x))
    assert np.abs(q - np.asarray(x)).max() <= 0.5 / 32767.0 + 1e-9
    # idempotent
    np.testing.assert_allclose(np.asarray(dsp.quantize_int16(jnp.asarray(q))), q)


def test_power_ratio_db(speechlike):
    x = jnp.asarray(speechlike)
    d = 0.01 * x
    got = float(dsp.power_ratio_db(x, d))
    assert abs(got - 40.0) < 1e-3


# -- STOI goldens ------------------------------------------------------------


def _broadband_speechlike(n=48000, seed=42):
    """AM-modulated pink-ish noise: energy in every 1/3-octave band with a
    shared 4 Hz envelope — real-speech-like statistics for STOI."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    white = rng.standard_normal(n)
    spec = np.fft.rfft(white)
    f = np.fft.rfftfreq(n, 1 / 16000.0)
    f[0] = 1.0
    pink = np.fft.irfft(spec / np.sqrt(f), n)
    env = 0.4 + 0.6 * np.clip(
        np.sin(2 * np.pi * 4.0 * t) + 0.3 * np.sin(2 * np.pi * 1.3 * t), 0, None
    )
    return (pink / np.abs(pink).max() * env).astype(np.float64)


def test_stoi_identity_and_goldens():
    """STOI invariants + frozen golden values.

    pystoi is not installable in this image, so absolute cross-validation is
    impossible here; instead (a) identity must score exactly 1, (b) the
    SNR curve must be monotone, and (c) values on a fixed broadband
    speech-like signal are FROZEN as regression goldens (computed once from
    this implementation).  The +20/-5 dB endpoints (0.99 / 0.27) match the
    published Taal et al. (ICASSP 2010) speech-in-stationary-noise regime.
    """
    from awm_tpu.dsp.stoi import stoi

    x = _broadband_speechlike()
    assert abs(stoi(x, x, 16000) - 1.0) < 1e-9

    rng = np.random.default_rng(7)
    noise = rng.standard_normal(len(x))

    def at_snr(snr_db):
        g = np.sqrt((x**2).mean() / ((noise**2).mean() * 10 ** (snr_db / 10)))
        return x + g * noise

    golden = {20: 0.991653, 10: 0.919861, 5: 0.775478, 0: 0.521766, -5: 0.267382}
    got = {snr: stoi(x, at_snr(snr), 16000) for snr in golden}
    vals = [got[s] for s in sorted(got, reverse=True)]
    assert all(a > b for a, b in zip(vals, vals[1:])), got  # monotone in SNR
    for snr, ref in golden.items():
        assert abs(got[snr] - ref) < 1e-4, (snr, got[snr], ref)


def test_pesq_optional_wiring():
    """pesq_score returns None gracefully when the pesq package is absent
    (this image), and evaluate_unseen_file omits the key rather than
    fabricating a value."""
    from awm_tpu.dsp.stoi import pesq_score

    x = _broadband_speechlike(n=16000)
    try:
        import pesq  # noqa: F401

        has_pesq = True
    except ImportError:
        has_pesq = False
    out = pesq_score(x, x, 16000)
    if has_pesq:
        assert isinstance(out, float) and out > 3.5  # identity ~ max MOS
    else:
        assert out is None


def test_resample_poly_matches_scipy():
    """Polyphase rational resampler vs scipy.signal.resample_poly with the
    identical default prototype (firwin kaiser beta=5) — covers the
    non-integer 22.05 k / 11.025 k ratios the reference's torchaudio I/O
    path implies (ref: py/main14.py:726-727)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(16000).astype(np.float32)
    for up, down in [(441, 320), (320, 441), (1, 2), (2, 1), (441, 640), (3, 1)]:
        ref = scipy.signal.resample_poly(
            x.astype(np.float64), up, down, window=("kaiser", 5.0)
        )
        got = np.asarray(dsp.resample_poly(jnp.asarray(x)[None], up, down))[0]
        assert got.shape == ref.shape, (up, down, got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, atol=2e-5)


def test_resample_rational_roundtrip_22k():
    """16 k -> 22.05 k -> 16 k round trip preserves in-band content and
    returns the original length (the arbitrary-ratio attack channel)."""
    from awm_tpu.augment import resample_roundtrip

    t = np.arange(16000) / 16000.0
    lo = jnp.asarray(np.sin(2 * np.pi * 1000 * t).astype(np.float32))[None]
    for rate in (22050, 11025):
        out = np.asarray(resample_roundtrip(lo, rate))
        assert out.shape == (1, 16000)
        # interior energy preserved (edges see filter transients)
        err = out[0, 1000:-1000] - np.asarray(lo)[0, 1000:-1000]
        assert np.sqrt((err**2).mean()) < 0.02, rate
    # 7 kHz content must NOT survive an 11.025 k round trip (Nyquist 5.5k)
    hi = jnp.asarray(np.sin(2 * np.pi * 7000 * t).astype(np.float32))[None]
    out = np.asarray(resample_roundtrip(hi, 11025))
    assert np.sqrt((out**2).mean()) < 0.05


def test_g711_codecs_bit_exact_vs_golden():
    """dsp/codec.py must match audioop (the canonical Sun/sox G.711
    implementation) BIT-FOR-BIT.  audioop was removed from the stdlib in
    Python 3.13 (ADVICE r3), so the contract is frozen as golden vectors
    (tests/golden/g711_audioop.npz, generated from this image's 3.12
    audioop): full 256-code decode domain for both laws + 94 sampled pcm
    encode values covering every segment boundary; this test runs on any
    Python.  test_g711_codecs_bit_exact_vs_audioop below still checks the
    FULL int16 encode domain when audioop is importable."""
    g = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "g711_audioop.npz"))
    np.testing.assert_array_equal(
        np.asarray(dsp.mulaw_encode(jnp.asarray(g["pcm"]))), g["mu_enc"])
    np.testing.assert_array_equal(
        np.asarray(dsp.alaw_encode(jnp.asarray(g["pcm"]))), g["a_enc"])
    codes = np.arange(256, dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(dsp.mulaw_decode(jnp.asarray(codes))), g["mu_dec"])
    np.testing.assert_array_equal(
        np.asarray(dsp.alaw_decode(jnp.asarray(codes))), g["a_dec"])


def test_g711_codecs_bit_exact_vs_audioop():
    """Full-int16-domain cross-check against stdlib audioop where it still
    exists (<=3.12); the frozen-golden test above covers newer Pythons."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        audioop = pytest.importorskip("audioop")

    pcm = np.arange(-32768, 32768, dtype=np.int16)
    frag = pcm.tobytes()
    codes = np.arange(256, dtype=np.uint8)

    np.testing.assert_array_equal(
        np.asarray(dsp.mulaw_encode(jnp.asarray(pcm))),
        np.frombuffer(audioop.lin2ulaw(frag, 2), np.uint8),
    )
    np.testing.assert_array_equal(
        np.asarray(dsp.mulaw_decode(jnp.asarray(codes))),
        np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), "<i2"),
    )
    np.testing.assert_array_equal(
        np.asarray(dsp.alaw_encode(jnp.asarray(pcm))),
        np.frombuffer(audioop.lin2alaw(frag, 2), np.uint8),
    )
    np.testing.assert_array_equal(
        np.asarray(dsp.alaw_decode(jnp.asarray(codes))),
        np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), "<i2"),
    )


def test_g711_roundtrip_snr_and_jit():
    """The float round trips behave like an 8-bit companding channel:
    ~35 dB SNR on speech-level audio, level-robust (that is the point of
    companding), jit-safe with static shapes."""
    import jax

    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000.0
    x = (0.25 * np.sin(2 * np.pi * 440 * t)
         + 0.02 * rng.standard_normal(16000)).astype(np.float32)[None]

    for fn in (dsp.mulaw_roundtrip, dsp.alaw_roundtrip):
        y = np.asarray(jax.jit(fn)(jnp.asarray(x)))
        assert y.shape == x.shape and y.dtype == x.dtype
        err = y - x
        snr = 10 * np.log10((x**2).mean() / (err**2).mean())
        assert 25.0 < snr < 45.0, (fn.__name__, snr)
        # companding keeps SNR roughly level-independent (vs linear 8-bit,
        # which would lose ~20 dB at 0.1x input level)
        y2 = np.asarray(fn(jnp.asarray(x * 0.1)))
        err2 = y2 - x * 0.1
        snr2 = 10 * np.log10((x * 0.1).var() / (err2**2).mean())
        assert abs(snr - snr2) < 8.0, (fn.__name__, snr, snr2)
