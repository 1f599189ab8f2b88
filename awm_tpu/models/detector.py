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
    # "shared" = the reference head: one 1x1 conv maps the 15-sample-RF trunk
    # to all 17 channels (ref: py/main14.py:132-148).  "dilated" adds a
    # dilated-conv stack (RF ~2,350 samples / 147 ms) for the bit channels
    # only: decoding a 16-bit message from 1 ms windows is the structural
    # reason the reference's bit accuracy sits at chance, while detection —
    # a 1-bit decision — survives it.  Detection channel stays on the shared
    # trunk, so imported reference checkpoints are unaffected ("shared").
    decode_head: str = "shared"  # "shared" | "dilated"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        h = x[..., None]  # (B, T, 1)
        h = Conv1d(self.channels, 7, padding=3, dtype=self.dtype, name="conv_in")(h)
        h = ResBlock(self.channels, dtype=self.dtype, name="res1")(h, train=train)
        h = ResBlock(self.channels, dtype=self.dtype, name="res2")(h, train=train)
        out = Conv1d(1 + self.message_bits, 1, dtype=self.dtype, name="conv_out")(h)
        if self.decode_head != "dilated":
            return out
        g = h
        for i, dil in enumerate((16, 128, 1024)):
            g = Conv1d(
                self.channels, 3, padding=dil, dilation=dil, dtype=self.dtype,
                name=f"dec_dil{i + 1}",
            )(g)
            g = nn.relu(g)
        dec = Conv1d(self.message_bits, 1, dtype=self.dtype, name="dec_out")(g)
        return jnp.concatenate([out[..., :1], dec], axis=-1)
