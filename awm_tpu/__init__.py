"""awm_tpu — TPU-native learned speech watermarking framework.

A from-scratch JAX/XLA/Pallas rebuild of the generator-detector speech
watermarking system in
Spandan7724/Audio-Watermarking-Deep-Learning-Watermarks-for-Authenticating-Speech:
a Generator embeds an additive, imperceptible perturbation carrying a 16-bit
message into 1-second 16 kHz clips; a Detector produces per-sample
watermark-presence and message-bit logits.  See SURVEY.md for the layer map.

Public API mirrors the reference's entry points (generate_watermarked_audio,
detect_watermark, Generator, Detector) while the implementation is designed
TPU-first: one jitted train step containing the full loss stack, batched
chunk processing instead of host-side loops, data-parallel sharding over a
device mesh.
"""

__version__ = "0.1.0"

from awm_tpu.config import Config, get_config, PRESETS

__all__ = ["Config", "get_config", "PRESETS", "__version__"]
