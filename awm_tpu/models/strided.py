"""main14b_2 strided architecture family (architecture-exploration preset).

Generator (ref: py/main14b_2.py:105-178): Conv(1->32, k7) -> 4 strided
residual blocks doubling channels 32->512 with strides (2,4,5,8)
(T 16000 -> 50) -> Linear proj to hidden 32 -> +message embedding (added
BEFORE the LSTM, unlike main14) -> 2-layer LSTM(32) -> Conv(32->128, k7) ->
4x [ConvTranspose(k=2s, stride s, pad s//2) + residual block] halving
channels -> Conv(->1, k7), padded/trimmed to the input length.

Detector (ref: py/main14b_2.py:180-224): same strided encoder + mirrored
ConvTranspose upsampler + Conv(32 -> 1+bits, k7).  The reference emits
channel-first (B, 1+bits, T); this build uses one internal layout,
(B, T, 1+bits), adapted at the API edge (SURVEY.md "hard parts").

This config collapsed in the reference run (BASELINE.md) — kept as a
faithful cautionary ablation.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from awm_tpu.models.layers import (
    Conv1d,
    ConvTranspose1d,
    Embedding,
    LSTM,
    StridedResBlock,
    torch_conv_init,
)


def _pad_or_trim(x: jnp.ndarray, t: int) -> jnp.ndarray:
    """Match the reference's trailing pad/trim to the input length
    (ref: py/main14b_2.py:171-177,217-222)."""
    cur = x.shape[-2]
    if cur > t:
        return x[..., :t, :]
    if cur < t:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, t - cur), (0, 0)]
        return jnp.pad(x, pad)
    return x


class Linear(nn.Module):
    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        w = self.param("w", torch_conv_init(fan_in), (fan_in, self.features))
        b = self.param("b", torch_conv_init(fan_in), (self.features,))
        if self.dtype is not None:
            x, w, b = x.astype(self.dtype), w.astype(self.dtype), b.astype(self.dtype)
        out = jnp.matmul(x, w, preferred_element_type=jnp.float32) + b
        return out.astype(x.dtype)


class StridedGenerator(nn.Module):
    message_bits: int = 16
    base_channels: int = 32
    hidden_dim: int = 32
    output_channels: int = 128
    strides: Tuple[int, ...] = (2, 4, 5, 8)
    lstm_layers: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, s: jnp.ndarray, message: jnp.ndarray | None = None, *, train: bool = False):
        t = s.shape[-1]
        x = s[..., None]
        x = Conv1d(self.base_channels, 7, padding=3, dtype=self.dtype, name="init_conv")(x)
        ch = self.base_channels
        for i, st in enumerate(self.strides):
            ch *= 2
            x = StridedResBlock(ch, stride=st, dtype=self.dtype, name=f"enc{i}")(x)

        x = Linear(self.hidden_dim, dtype=self.dtype, name="proj")(x)

        if message is not None and self.message_bits > 0:
            emb = Embedding(2**self.message_bits, self.hidden_dim, name="embedding")(
                message
            )
            x = x + emb[:, None, :].astype(x.dtype)

        for i in range(self.lstm_layers):
            x = LSTM(self.hidden_dim, name=f"lstm{i}")(x)

        x = Conv1d(self.output_channels, 7, padding=3, dtype=self.dtype, name="final_conv_enc")(x)

        in_ch = self.output_channels
        for i, st in enumerate(reversed(self.strides)):
            out_ch = in_ch // 2
            x = ConvTranspose1d(
                out_ch, 2 * st, stride=st, padding=st // 2, dtype=self.dtype, name=f"dec_up{i}"
            )(x)
            x = StridedResBlock(out_ch, stride=1, dtype=self.dtype, name=f"dec_res{i}")(x)
            in_ch = out_ch

        x = Conv1d(1, 7, padding=3, dtype=self.dtype, name="final_conv_dec")(x)
        return _pad_or_trim(x, t)[..., 0]


class StridedDetector(nn.Module):
    message_bits: int = 16
    base_channels: int = 32
    strides: Tuple[int, ...] = (2, 4, 5, 8)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        t = x.shape[-1]
        h = x[..., None]
        h = Conv1d(self.base_channels, 7, padding=3, dtype=self.dtype, name="init_conv")(h)
        ch = self.base_channels
        for i, st in enumerate(self.strides):
            ch *= 2
            h = StridedResBlock(ch, stride=st, dtype=self.dtype, name=f"enc{i}")(h)

        in_ch = ch
        for i, st in enumerate(reversed(self.strides)):
            out_ch = in_ch // 2
            h = ConvTranspose1d(
                out_ch, 2 * st, stride=st, padding=st // 2, dtype=self.dtype, name=f"up{i}"
            )(h)
            h = StridedResBlock(out_ch, stride=1, dtype=self.dtype, name=f"up_res{i}")(h)
            in_ch = out_ch

        h = Conv1d(1 + self.message_bits, 7, padding=3, dtype=self.dtype, name="final_conv")(h)
        return _pad_or_trim(h, t)  # (B, T, 1+bits) logits
