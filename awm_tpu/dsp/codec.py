"""G.711 telephony-codec channel simulation: mu-law and A-law round trips.

The reference's robustness story stops at lowpass+quantize channel sims
(ref: main15c.ipynb cell 4); real distribution channels include 8-bit
G.711 telephony codecs.  No codec binaries exist in this image (no
ffmpeg/sox/lame), but G.711 is pure integer arithmetic, so the encoder and
decoder are implemented here directly in jnp ops — jit-safe, static-shape,
vectorized — with EXACT bit-level parity against CPython's stdlib
``audioop`` implementation (itself the classic Sun/sox G.711 code);
tests/test_dsp.py proves byte-for-byte equality on the full int16 range.

Gradient note: like dsp.quantize_int16 (round() has zero gradient), these
are channel ATTACKS — robustness training relies on the surrounding loss
terms, matching the reference's quantize-in-graph behavior.
"""

from __future__ import annotations

import jax.numpy as jnp

_BIAS = 0x84  # G.711 mu-law bias (132)
_MU_CLIP = 8159
_SEG_UEND = (0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF)
_SEG_AEND = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)


def _seg_number(mag: jnp.ndarray, table) -> jnp.ndarray:
    """Index of the first table entry >= mag (8 if none) — G.711 'search'."""
    seg = jnp.zeros_like(mag)
    for uend in table:
        seg = seg + (mag > uend).astype(mag.dtype)
    return seg


def mulaw_encode(pcm16: jnp.ndarray) -> jnp.ndarray:
    """int16 PCM -> 8-bit mu-law code (audioop.lin2ulaw width=2 exact)."""
    p = jnp.right_shift(pcm16.astype(jnp.int32), 2)  # 14-bit, arithmetic
    neg = p < 0
    mask = jnp.where(neg, 0x7F, 0xFF)
    mag = jnp.minimum(jnp.where(neg, -p, p), _MU_CLIP) + (_BIAS >> 2)
    seg = _seg_number(mag, _SEG_UEND)
    s = jnp.minimum(seg, 7)
    uval = jnp.left_shift(s, 4) | (jnp.right_shift(mag, s + 1) & 0xF)
    code = jnp.where(seg >= 8, 0x7F ^ mask, uval ^ mask)
    return code.astype(jnp.uint8)


def mulaw_decode(code: jnp.ndarray) -> jnp.ndarray:
    """8-bit mu-law code -> int16 PCM (audioop.ulaw2lin width=2 exact)."""
    u = (~code.astype(jnp.int32)) & 0xFF
    t = ((u & 0xF) << 3) + _BIAS
    t = jnp.left_shift(t, jnp.right_shift(u & 0x70, 4))
    out = jnp.where((u & 0x80) != 0, _BIAS - t, t - _BIAS)
    return out.astype(jnp.int16)


def alaw_encode(pcm16: jnp.ndarray) -> jnp.ndarray:
    """int16 PCM -> 8-bit A-law code (audioop.lin2alaw width=2 exact)."""
    p = jnp.right_shift(pcm16.astype(jnp.int32), 3)  # 13-bit, arithmetic
    neg = p < 0
    mask = jnp.where(neg, 0x55, 0xD5)
    mag = jnp.where(neg, -p - 1, p)
    seg = _seg_number(mag, _SEG_AEND)
    s = jnp.minimum(seg, 7)
    shift = jnp.where(s < 2, 1, s)
    aval = jnp.left_shift(s, 4) | (jnp.right_shift(mag, shift) & 0xF)
    code = jnp.where(seg >= 8, 0x7F ^ mask, aval ^ mask)
    return code.astype(jnp.uint8)


def alaw_decode(code: jnp.ndarray) -> jnp.ndarray:
    """8-bit A-law code -> int16 PCM (audioop.alaw2lin width=2 exact)."""
    a = (code.astype(jnp.int32) ^ 0x55) & 0xFF
    t = (a & 0xF) << 4
    seg = jnp.right_shift(a & 0x70, 4)
    t = jnp.where(
        seg == 0,
        t + 8,
        jnp.left_shift(t + 0x108, jnp.maximum(seg - 1, 0)),
    )
    out = jnp.where((a & 0x80) != 0, t, -t)
    return out.astype(jnp.int16)


def _roundtrip(x: jnp.ndarray, enc, dec) -> jnp.ndarray:
    pcm = jnp.clip(jnp.round(x * 32767.0), -32768, 32767).astype(jnp.int16)
    y = dec(enc(pcm)).astype(jnp.float32) / 32767.0
    return y.astype(x.dtype)


def mulaw_roundtrip(x: jnp.ndarray) -> jnp.ndarray:
    """Float audio in (-1, 1) through an 8-bit G.711 mu-law channel."""
    return _roundtrip(x, mulaw_encode, mulaw_decode)


def alaw_roundtrip(x: jnp.ndarray) -> jnp.ndarray:
    """Float audio in (-1, 1) through an 8-bit G.711 A-law channel."""
    return _roundtrip(x, alaw_encode, alaw_decode)
