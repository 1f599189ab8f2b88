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
            emb = Embedding(2**self.message_bits, self.channels, name="embedding")(
                message
            )  # (B, C)
            x = x + emb[:, None, :].astype(x.dtype)  # broadcast over every timestep

        x = ConvTranspose1d(self.channels, 7, padding=3, dtype=self.dtype, name="dec_deconv")(x)
        x = ResBlock(self.channels, dtype=self.dtype, name="dec_res")(x, train=train)
        delta = Conv1d(1, 1, dtype=self.dtype, name="dec_out")(x)
        return delta[..., 0]  # (B, T)
