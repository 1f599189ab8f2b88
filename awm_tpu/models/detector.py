"""Detector: waveform -> per-sample watermark + message-bit logits.

main14-family architecture (ref: py/main14.py:132-148):
Conv1d(1->64, k7) + 2x ResBlock(64) + Conv1d(64->1+bits, k1), producing
(B, T, 1+bits) logits — channel 0 is watermark presence per sample, channels
1..bits are per-bit message logits.  52,053 tensor elements including BN
running stats, matching models/detector_best.pth (SURVEY.md section 2.4).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from awm_tpu.models.layers import Conv1d, ResBlock


class Detector(nn.Module):
    """Maps (B, T) waveform -> (B, T, 1 + message_bits) logits.

    dtype=jnp.bfloat16 runs conv/BN compute in bf16; logits come back in the
    compute dtype — callers cast to fp32 before sigmoid/loss reductions.
    """

    message_bits: int = 16
    channels: int = 64
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        h = x[..., None]  # (B, T, 1)
        h = Conv1d(self.channels, 7, padding=3, dtype=self.dtype, name="conv_in")(h)
        h = ResBlock(self.channels, dtype=self.dtype, name="res1")(h, train=train)
        h = ResBlock(self.channels, dtype=self.dtype, name="res2")(h, train=train)
        return Conv1d(1 + self.message_bits, 1, dtype=self.dtype, name="conv_out")(h)
