"""Shared flax building blocks: torch-init convs, BatchNorm ResBlock, LSTM.

Channels-last (B, T, C) throughout — TPU lane-friendly.  Initializers match
torch defaults (kaiming-uniform a=sqrt(5) == U(+-1/sqrt(fan_in)) for conv and
linear weights AND biases; U(+-1/sqrt(H)) for LSTM; N(0,1) for embeddings) so
training dynamics are comparable with the reference runs.

Mixed precision: every module takes a ``dtype`` — None (default) keeps the
promotion semantics of whatever flows in (fp32 params -> fp32 compute, the
strict-parity path); jnp.bfloat16 casts activations AND weight views to bf16
at the op, halving HBM traffic for the conv/BN-heavy nets, while parameters,
BN statistics, LSTM recurrence, and all loss reductions stay fp32 (the
reference's TF32-on-CUDA analogue, ref: py/main14.py:40).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from awm_tpu.ops import conv1d, conv_transpose1d, lstm_forward


def torch_conv_init(fan_in: int):
    """U(+-1/sqrt(fan_in)) — torch's effective Conv/Linear default."""
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv1d(nn.Module):
    """torch.nn.Conv1d semantics over (B, T, C); weight (k, in, out)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel_size
        w = self.param(
            "w", torch_conv_init(fan_in), (self.kernel_size, in_ch, self.features)
        )
        b = (
            self.param("b", torch_conv_init(fan_in), (self.features,))
            if self.use_bias
            else None
        )
        if self.dtype is not None:
            x, w = x.astype(self.dtype), w.astype(self.dtype)
            b = b.astype(self.dtype) if b is not None else None
        return conv1d(
            x, w, b, stride=self.stride, padding=self.padding, dilation=self.dilation
        )


class ConvTranspose1d(nn.Module):
    """torch.nn.ConvTranspose1d semantics; weight (k, in, out)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # torch ConvTranspose fan_in = out_ch * k (weight shape (in, out, k)).
        fan_in = self.features * self.kernel_size
        w = self.param(
            "w", torch_conv_init(fan_in), (self.kernel_size, in_ch, self.features)
        )
        b = self.param("b", torch_conv_init(fan_in), (self.features,))
        if self.dtype is not None:
            x, w, b = x.astype(self.dtype), w.astype(self.dtype), b.astype(self.dtype)
        return conv_transpose1d(
            x,
            w,
            b,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
        )


class BatchNorm(nn.Module):
    """torch.nn.BatchNorm1d over the channel axis of (B, T, C).

    torch momentum 0.1 == flax momentum 0.9 (flax: ra = m*ra + (1-m)*batch).
    The reference normalizes detector batches of concatenated
    [watermarked; clean] examples (ref: py/main14.py:203-206) — preserved by
    construction since stats are taken over whatever batch flows through.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis=-1,
            dtype=self.dtype,
            name="bn",
        )(x)


class ResBlock(nn.Module):
    """main14-family residual block: Conv-BN-ReLU-Conv-BN + skip, ReLU
    (ref: py/main14.py:74-87)."""

    ch: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # flax BatchNorm with dtype=bf16 still computes batch statistics in
        # fp32 and keeps running stats fp32 (verified: normalization.py
        # _compute_stats promotes) — only the normalized output is bf16.
        y = Conv1d(self.ch, 3, padding=1, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(y)
        y = nn.relu(y)
        y = Conv1d(self.ch, 3, padding=1, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn2",
        )(y)
        return nn.relu(x.astype(y.dtype) + y)


class StridedResBlock(nn.Module):
    """main14b_2 residual block: strided conv + ELU + conv, 1x1 strided skip
    when shape changes (ref: py/main14b_2.py:86-103)."""

    features: int
    stride: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        downsample = self.stride != 1 or in_ch != self.features
        y = nn.elu(
            Conv1d(self.features, 3, stride=self.stride, padding=1,
                   dtype=self.dtype, name="conv1")(x)
        )
        y = Conv1d(self.features, 3, padding=1, dtype=self.dtype, name="conv2")(y)
        res = x
        if downsample:
            res = Conv1d(self.features, 1, stride=self.stride,
                         dtype=self.dtype, name="skip")(x)
        return nn.elu(y + res.astype(y.dtype))


class LSTM(nn.Module):
    """Single-layer torch-layout LSTM over (B, T, D) -> (B, T, H).

    impl: 'auto' uses the fused Pallas kernel on TPU (bit-identical, ~2x
    faster, and avoids the (B, T, 4H) HBM intermediate) and lax.scan
    elsewhere; 'scan'/'pallas' force a path.  The Pallas forward carries a
    custom_vjp whose backward replays the differentiable scan.
    """

    hidden: int
    unroll: int = 16
    impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        bound = 1.0 / (self.hidden**0.5)

        def uinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        def binit(key, shape, dtype=jnp.float32):
            # torch keeps b_ih and b_hh separately (each U(+-1/sqrt(H))) and
            # always sums them; storing one bias must therefore draw the SUM
            # of two independent uniforms (triangular on +-2/sqrt(H)) to match
            # torch's fresh-init variance.  Checkpoint import already sums.
            k1, k2 = jax.random.split(key)
            return jax.random.uniform(k1, shape, dtype, -bound, bound) + (
                jax.random.uniform(k2, shape, dtype, -bound, bound)
            )

        w_ih = self.param("w_ih", uinit, (4 * self.hidden, d))
        w_hh = self.param("w_hh", uinit, (4 * self.hidden, self.hidden))
        b = self.param("b", binit, (4 * self.hidden,))
        # B<8 pads the batch below the TPU sublane tile; measured 1.4e-4
        # forward drift vs scan at B=1 (benign but avoidable).  B>=8 but not
        # a multiple of 8 fails Mosaic outright (the kernel's (TC,B,4H)
        # reshape cannot retile a sublane-misaligned batch — hit by e.g. a
        # 51-row validation remainder).  'auto' therefore routes any
        # non-sublane-aligned batch to the scan path.
        use_pallas = self.impl == "pallas" or (
            self.impl == "auto"
            and jax.default_backend() == "tpu"
            and x.shape[0] >= 8
            and x.shape[0] % 8 == 0
        )
        if use_pallas:
            from awm_tpu.ops.pallas.lstm_kernel import lstm_fused_auto

            return lstm_fused_auto(x, w_ih, w_hh, b)
        return lstm_forward(x, w_ih, w_hh, b, unroll=self.unroll)


class Embedding(nn.Module):
    """torch.nn.Embedding(num, dim) with N(0,1) init; indexed by the integer
    message (ref: py/main14.py:103,118-121)."""

    num: int
    dim: int

    @nn.compact
    def __call__(self, idx):
        table = self.param(
            "table", nn.initializers.normal(stddev=1.0), (self.num, self.dim)
        )
        return jnp.take(table, idx, axis=0)
