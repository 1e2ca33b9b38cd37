"""MaskedVByte-format codec, numpy-vectorized.

Wire format is the classic LEB128-style varint the MaskedVByte library
encodes/decodes (``/root/reference/include/pisa/codec/maskedvbyte.hpp``
wraps ``vbyte_encode`` / ``masked_vbyte_decode``): each value is emitted
as little-endian 7-bit groups, the high bit SET on every byte except the
last of a value.  The SIMD part of MaskedVByte is a decoding strategy
(PSHUFB masks looked up from the control bits), not a format — here the
same byte stream is decoded with a vectorized terminal-byte scatter
instead.

The reference's block wrapper falls back to interpolative coding for
partial (<128-int) blocks; our framing applies the codec to every block
uniformly (the registry contract — see ``pisa_ray/codecs/__init__``).
"""

from __future__ import annotations

import numpy as np

_THRESH = (0x7F, 0x3FFF, 0x1FFFFF, 0xFFFFFFF)


def mvb_encode(values: np.ndarray) -> bytes:
    values = np.ascontiguousarray(values, dtype=np.uint32)
    n = len(values)
    if n == 0:
        return b""
    lens = np.ones(n, dtype=np.int64)
    for t in _THRESH:
        lens += values > t
    ends = np.cumsum(lens)
    starts = ends - lens
    data = np.zeros(int(ends[-1]), dtype=np.uint8)
    for k in range(5):
        mask = lens > k
        if not mask.any():
            break
        byte = ((values[mask] >> np.uint32(7 * k))
                & np.uint32(0x7F)).astype(np.uint8)
        # continuation bit on every byte but the value's last
        byte[lens[mask] > k + 1] |= 0x80
        data[starts[mask] + k] = byte
    return data.tobytes()


def mvb_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    buf = np.frombuffer(data, dtype=np.uint8)
    term = np.flatnonzero((buf & 0x80) == 0)[:n]
    ends = term + 1
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1]
    lens = ends - starts
    out = np.zeros(n, dtype=np.uint32)
    for k in range(5):
        mask = lens > k
        if not mask.any():
            break
        out[mask] |= (buf[starts[mask] + k].astype(np.uint32)
                      & np.uint32(0x7F)) << np.uint32(7 * k)
    return out
