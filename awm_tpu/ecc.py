"""Optional error-correcting code inside the 16-bit message slot.

The reference treats the 16 bit channels as a raw payload (ref:
py/main14.py:219-223, 925-929) — one flipped bit corrupts the message.
This module trades 5 payload bits for a SECDED code so blind decode
becomes message-exact far more often: Hamming(15,11) plus an overall
parity bit fills exactly the 16 architected bit channels, corrects any
single-bit error, and *detects* (refuses to mis-correct) double errors.

At the capstone checkpoint's measured 0.93 per-bit accuracy, raw
16-bit messages are exact with p = 0.93^16 ~= 0.31; single-error
correction lifts the exact-decode rate to P(<=1 error) ~= 0.70.

Layout (LSB-first, matching models/messages.py): bit index 0 is the
overall parity; indices 1..15 are Hamming positions 1..15 with parity
bits at positions 1, 2, 4, 8 and the 11 payload bits at the remaining
positions in ascending order.

Everything here is host-side integer math on decoded bits — the model
and its on-device reductions are unchanged.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

PAYLOAD_BITS = 11
CODE_BITS = 16
_PARITY_POS = (1, 2, 4, 8)
_DATA_POS = tuple(p for p in range(1, 16) if p not in _PARITY_POS)  # 11 slots


def ecc_encode(payload: int) -> int:
    """11-bit payload -> 16-bit SECDED codeword (int, LSB-first bit order)."""
    payload = int(payload)
    if not 0 <= payload < 2**PAYLOAD_BITS:
        raise ValueError(
            f"ECC payload must be in [0, {2**PAYLOAD_BITS}) (11 bits), got {payload}"
        )
    bits = [0] * 16
    for i, pos in enumerate(_DATA_POS):
        bits[pos] = (payload >> i) & 1
    for p in _PARITY_POS:
        bits[p] = 0
        par = 0
        for pos in range(1, 16):
            if pos & p:
                par ^= bits[pos]
        bits[p] = par
    bits[0] = 0
    overall = 0
    for pos in range(16):
        overall ^= bits[pos]
    bits[0] = overall  # total parity of the 16-bit word is even
    return sum(b << i for i, b in enumerate(bits))


def ecc_decode(word: "int | Sequence[int]") -> Tuple[int, int, bool]:
    """16-bit codeword (int or LSB-first bit sequence) ->
    (payload, corrected_bits, ok).

    corrected_bits is 0 (clean) or 1 (single error fixed); ok=False flags a
    detected-uncorrectable double error — the payload is then the best-effort
    decode of the uncorrected data bits and MUST NOT be trusted.
    """
    if isinstance(word, (int, np.integer)):
        bits = [(int(word) >> i) & 1 for i in range(16)]
    else:
        bits = [int(b) & 1 for b in word]
        if len(bits) != CODE_BITS:
            raise ValueError(f"need {CODE_BITS} bits, got {len(bits)}")

    syndrome = 0
    for pos in range(1, 16):
        if bits[pos]:
            syndrome ^= pos
    overall = 0
    for pos in range(16):
        overall ^= bits[pos]

    corrected = 0
    ok = True
    if syndrome == 0 and overall == 0:
        pass  # clean
    elif overall == 1:
        # odd total parity: exactly one bit wrong — at `syndrome`
        # (or the overall-parity bit itself when syndrome == 0)
        bits[syndrome] ^= 1
        corrected = 1
    else:
        # even parity but nonzero syndrome: two bits wrong, uncorrectable
        ok = False

    payload = 0
    for i, pos in enumerate(_DATA_POS):
        payload |= bits[pos] << i
    return payload, corrected, ok


def ecc_decode_batch(words: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized convenience over (N,) int codewords or (N, 16) bit arrays.
    Returns (payloads (N,), corrected (N,), ok (N,))."""
    words = np.asarray(words)
    rows = words if words.ndim == 2 else words[:, None]
    out = [
        ecc_decode(int(w[0]) if words.ndim == 1 else w)
        for w in rows
    ]
    payloads, corrected, ok = zip(*out) if out else ((), (), ())
    return (
        np.asarray(payloads, np.int64),
        np.asarray(corrected, np.int64),
        np.asarray(ok, bool),
    )
