from awm_tpu.models.generator import Generator
from awm_tpu.models.detector import Detector
from awm_tpu.models.strided import StridedGenerator, StridedDetector
from awm_tpu.models.messages import (
    message_to_bits,
    bits_to_message,
    decode_bits_mean_logit,
    decode_bits_majority,
)


def build_models(model_cfg, dtype=None):
    """Instantiate the (generator, detector) pair for a ModelConfig.

    dtype: compute dtype for conv/BN work (None = fp32 promotion semantics,
    jnp.bfloat16 = mixed precision; params/BN stats/LSTM recurrence stay fp32).
    """
    if model_cfg.family == "base":
        return (
            Generator(
                message_bits=model_cfg.message_bits,
                channels=model_cfg.channels,
                lstm_impl=model_cfg.lstm_impl,
                dtype=dtype,
                message_encoding=model_cfg.message_encoding,
                delta_band_hz=model_cfg.delta_band_hz,
            ),
            Detector(message_bits=model_cfg.message_bits, channels=model_cfg.channels,
                     dtype=dtype, decode_head=model_cfg.decode_head),
        )
    if model_cfg.family == "strided":
        # the decode-collapse variants exist only for the base family; the
        # strided models would silently ignore them (fail-fast convention)
        if (
            model_cfg.message_encoding != "table"
            or model_cfg.decode_head != "shared"
            or model_cfg.delta_band_hz is not None
        ):
            raise ValueError(
                "message_encoding/decode_head/delta_band_hz variants are not "
                f"implemented for the strided family (got message_encoding="
                f"{model_cfg.message_encoding!r}, decode_head="
                f"{model_cfg.decode_head!r}, delta_band_hz="
                f"{model_cfg.delta_band_hz!r}); use --preset base"
            )
        return (
            StridedGenerator(
                message_bits=model_cfg.message_bits,
                base_channels=model_cfg.base_channels,
                hidden_dim=model_cfg.hidden_dim,
                output_channels=model_cfg.output_channels,
                strides=tuple(model_cfg.strides),
                lstm_layers=model_cfg.lstm_layers,
                dtype=dtype,
            ),
            StridedDetector(
                message_bits=model_cfg.message_bits,
                base_channels=model_cfg.base_channels,
                strides=tuple(model_cfg.strides),
                dtype=dtype,
            ),
        )
    raise ValueError(f"unknown model family {model_cfg.family!r}")


__all__ = [
    "Generator",
    "Detector",
    "StridedGenerator",
    "StridedDetector",
    "build_models",
    "message_to_bits",
    "bits_to_message",
    "decode_bits_mean_logit",
    "decode_bits_majority",
]
