"""Pure-JAX DSP core: spectral ops, filters, metrics.

All functions are jit-safe, static-shaped, and fusion-friendly; they form the
fusion substrate for the loss stack (SURVEY.md section 7, build step 1).
"""

from awm_tpu.dsp.stft import (
    hann_window,
    frame,
    stft,
    spectrogram,
    mel_filterbank,
    mel_spectrogram,
    log_mel,
    hz_to_mel,
    mel_to_hz,
)
from awm_tpu.dsp.filters import (
    fir_lowpass,
    sinc_lowpass_kernel,
    lowpass_biquad,
    lowpass_biquad_coeffs,
)
from awm_tpu.dsp.metrics import si_snr, rms, power_ratio_db, quantize_int16
from awm_tpu.dsp.codec import (
    mulaw_encode,
    mulaw_decode,
    mulaw_roundtrip,
    alaw_encode,
    alaw_decode,
    alaw_roundtrip,
)
from awm_tpu.dsp.quality import nsim_quality
from awm_tpu.dsp.resample import resample_poly, resample_rational

__all__ = [
    "hann_window",
    "frame",
    "stft",
    "spectrogram",
    "mel_filterbank",
    "mel_spectrogram",
    "log_mel",
    "hz_to_mel",
    "mel_to_hz",
    "fir_lowpass",
    "sinc_lowpass_kernel",
    "lowpass_biquad",
    "lowpass_biquad_coeffs",
    "si_snr",
    "rms",
    "power_ratio_db",
    "quantize_int16",
    "mulaw_encode",
    "mulaw_decode",
    "mulaw_roundtrip",
    "alaw_encode",
    "alaw_decode",
    "alaw_roundtrip",
    "nsim_quality",
    "resample_poly",
    "resample_rational",
]
