"""1-D convolution primitives with torch-exact semantics, TPU-native layout.

The reference's nets are stacks of nn.Conv1d / nn.ConvTranspose1d in NCH
layout (ref: py/main14.py:74-148, py/main14b_2.py:86-224).  Here everything
is channels-last (B, T, C) — the idiomatic TPU layout, keeping the channel
axis on the 128-wide lane dimension so XLA tiles convs onto the MXU — and
weights are (k, in, out).  Semantics (padding arithmetic, transposed-conv
output length, cross-correlation direction) match torch exactly so reference
checkpoints import bit-compatibly; verified against torch CPU in
tests/test_ops.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DIMS = ("NHC", "HIO", "NHC")


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
) -> jnp.ndarray:
    """torch.nn.Conv1d equivalent.  x: (B, T, Cin), w: (k, Cin, Cout).

    dilation follows torch's semantics (kernel-tap spacing); same-length
    output needs padding = dilation * (k - 1) // 2 for odd k."""
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMS,
    )
    if b is not None:
        out = out + b
    return out


def conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
) -> jnp.ndarray:
    """torch.nn.ConvTranspose1d equivalent.  x: (B, T, Cin), w: (k, Cin, Cout).

    Output length (T-1)*stride - 2*padding + k + output_padding, exactly as
    torch.  Implemented as an input-dilated convolution with the kernel
    flipped along time — a single conv_general_dilated call XLA maps to the
    MXU, rather than a scatter.
    """
    k = w.shape[0]
    w_flip = jnp.flip(w, axis=0)
    out = jax.lax.conv_general_dilated(
        x,
        w_flip,
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding + output_padding)],
        lhs_dilation=(stride,),
        dimension_numbers=_DIMS,
    )
    if b is not None:
        out = out + b
    return out
