from awm_tpu.utils.audio_io import (
    load_audio,
    save_wav,
    to_mono,
    resample,
    load_mono_16k,
)

__all__ = ["load_audio", "save_wav", "to_mono", "resample", "load_mono_16k"]
