"""Simple16 codec (28-bit payload words, 16 packing configurations).

The classic Simple16 scheme (Zhang, Long & Suel, WWW'08) the reference
uses via FastPFor (``/root/reference/include/pisa/codec/simple16.hpp``):
each 32-bit word carries a 4-bit selector (top bits) plus 28 payload
bits split into fixed-width slots per the selector table below.  Encoding
is greedy — for each word, the first selector whose slot widths fit the
next values wins; a trailing word may fill only its leading slots (decode
stops after ``n`` values).  Values must fit in 28 bits; larger inputs
raise (inherent limit of the scheme — pick a vbyte/bitpack codec for
wider values).

Payload packing: first value in the MOST significant payload bits
(big-endian within the word), our framing choice, applied consistently
by encode/decode.
"""

from __future__ import annotations

import numpy as np

# selector → per-slot bit widths (sum = 28)
_CONFIGS = [
    [1] * 28,
    [2] * 7 + [1] * 14,
    [1] * 7 + [2] * 7 + [1] * 7,
    [1] * 14 + [2] * 7,
    [2] * 14,
    [4] * 1 + [3] * 8,
    [3] * 1 + [4] * 4 + [3] * 3,
    [4] * 7,
    [5] * 4 + [4] * 2,
    [4] * 2 + [5] * 4,
    [6] * 3 + [5] * 2,
    [5] * 2 + [6] * 3,
    [7] * 4,
    [10] * 1 + [9] * 2,
    [14] * 2,
    [28] * 1,
]
_WIDTHS = [np.array(c, dtype=np.uint32) for c in _CONFIGS]
_LIMITS = [(np.uint32(1) << w) - np.uint32(1) for w in _WIDTHS]
# bit offset of each slot's LSB within the 28-bit payload (first slot highest)
_SHIFTS = [28 - np.cumsum(c).astype(np.uint32) for c in _CONFIGS]
_MAX = (1 << 28) - 1


def s16_encode(values: np.ndarray) -> bytes:
    values = np.ascontiguousarray(values, dtype=np.uint32)
    n = len(values)
    if n == 0:
        return b""
    if values.max() > _MAX:
        raise ValueError("simple16 encodes values < 2^28 only")
    words = []
    i = 0
    while i < n:
        rest = n - i
        for sel in range(16):
            w = _WIDTHS[sel]
            k = min(len(w), rest)
            chunk = values[i:i + k]
            if (chunk <= _LIMITS[sel][:k]).all():
                word = np.uint32(sel) << np.uint32(28)
                word |= np.bitwise_or.reduce(
                    chunk << _SHIFTS[sel][:k]) if k else np.uint32(0)
                words.append(word)
                i += k
                break
        else:  # pragma: no cover - sel 15 (1×28) always fits
            raise AssertionError("no simple16 selector fits")
    return np.array(words, dtype=np.uint32).tobytes()


def s16_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    words = np.frombuffer(data, dtype=np.uint32)
    out = np.empty(n, dtype=np.uint32)
    got = 0
    for word in words:
        if got >= n:
            break
        sel = int(word >> np.uint32(28))
        w = _WIDTHS[sel]
        k = min(len(w), n - got)
        payload = word & np.uint32(_MAX)
        out[got:got + k] = (payload >> _SHIFTS[sel][:k]) & _LIMITS[sel][:k]
        got += k
    return out
