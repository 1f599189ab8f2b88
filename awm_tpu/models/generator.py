"""Generator: waveform + 16-bit message -> additive watermark delta.

main14-family architecture (ref: py/main14.py:90-124):
encoder Conv1d(1->64, k7) + 2x ResBlock(64)  ->  LSTM(64->64)  ->
+ Embedding(2^16, 64)[message] broadcast over time  ->
decoder ConvTranspose1d(64->64, k7) + ResBlock(64) + Conv1d(64->1, k1).

TPU-first differences from the reference: channels-last layout end to end
(no permutes), the LSTM input projection hoisted to one MXU matmul, and the
whole forward jit-compiled as part of a single train-step graph.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from awm_tpu.models.layers import Conv1d, ConvTranspose1d, Embedding, LSTM, ResBlock


class Generator(nn.Module):
    """Maps (B, T) waveform + (B,) integer message -> (B, T) delta.

    dtype=jnp.bfloat16 runs conv/BN compute in bf16 (params, LSTM recurrence
    and the message-embedding table stay fp32); the returned delta is in the
    compute dtype — callers cast to fp32 before loss/DSP work.
    """

    message_bits: int = 16
    channels: int = 64
    lstm_unroll: int = 16
    lstm_impl: str = "auto"
    dtype: Optional[Any] = None
    # "table" = the reference's Embedding(2^16, 64) lookup (ref:
    # py/main14.py:103).  "bits" = bit-compositional encoder: each of the 16
    # bits contributes a learned 64-dim direction, sign-flipped by the bit
    # value.  The table is why decode collapses to chance in the reference's
    # own runs (BASELINE.md bit acc 0.5009): each of the 65,536 rows is
    # sampled ~B/65536 times per step, so no bit-structured code can form;
    # the 16 shared bit directions get gradient from EVERY example.
    message_encoding: str = "table"  # "table" | "bits"
    # Band-limit the carrier by construction: fixed zero-phase sinc FIR on
    # delta as the final op (no params — part of the architecture, so the
    # constraint is identical at train and inference and survives in the
    # arch sidecar).  See ModelConfig.delta_band_hz for the rationale.
    delta_band_hz: Optional[float] = None

    @nn.compact
    def __call__(self, s: jnp.ndarray, message: jnp.ndarray | None = None, *, train: bool = False):
        x = s[..., None]  # (B, T, 1)
        x = Conv1d(self.channels, 7, padding=3, dtype=self.dtype, name="enc_conv")(x)
        x = ResBlock(self.channels, dtype=self.dtype, name="enc_res1")(x, train=train)
        x = ResBlock(self.channels, dtype=self.dtype, name="enc_res2")(x, train=train)

        # LSTM compute follows its input dtype with fp32 internals (scan path
        # pins fp32 accumulation; Pallas kernel is fp32 throughout and casts
        # its output back) — no dtype attribute needed.
        x = LSTM(self.channels, unroll=self.lstm_unroll, impl=self.lstm_impl, name="lstm")(x)

        if self.message_bits > 0 and message is not None:
            if self.message_encoding == "bits":
                from awm_tpu.models.messages import message_to_bits

                signs = message_to_bits(message, self.message_bits) * 2.0 - 1.0
                emb = nn.Dense(
                    self.channels, use_bias=False, name="bit_proj",
                    # sum of 16 +-1-weighted directions: stddev 1/4 per
                    # direction gives unit variance per channel, matching the
                    # table's N(0,1) rows
                    kernel_init=nn.initializers.normal(stddev=0.25),
                )(signs)  # (B, C)
            else:
                emb = Embedding(2**self.message_bits, self.channels, name="embedding")(
                    message
                )  # (B, C)
            x = x + emb[:, None, :].astype(x.dtype)  # broadcast over every timestep

        x = ConvTranspose1d(self.channels, 7, padding=3, dtype=self.dtype, name="dec_deconv")(x)
        x = ResBlock(self.channels, dtype=self.dtype, name="dec_res")(x, train=train)
        delta = Conv1d(1, 1, dtype=self.dtype, name="dec_out")(x)
        delta = delta[..., 0]  # (B, T)
        if self.delta_band_hz is not None:
            from awm_tpu.dsp import fir_lowpass

            delta = fir_lowpass(delta, self.delta_band_hz, taps=101)
        return delta
