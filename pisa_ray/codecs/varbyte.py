"""Variable-byte codec (TightVariableByte-style).

7 data bits per byte, the final byte of each value has the high bit set —
the same convention as the reference's ``TightVariableByte``
(``/root/reference/include/pisa/codec/block_codecs.hpp:19-125``).  Used for
short lists / headers where bit packing has too much overhead.
Encode/decode are numpy-vectorized (no per-value Python loop).
"""

from __future__ import annotations

import numpy as np


def varbyte_encode(values: np.ndarray) -> bytes:
    values = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(values)
    if n == 0:
        return b""
    # bytes needed per value (1..5 for u32)
    nbytes = np.maximum((np.vectorize(int.bit_length)(values.astype(object)) + 6) // 7, 1)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # fill byte k (little-endian 7-bit groups) for every value that has it
    maxb = int(nbytes.max())
    v = values.copy()
    for k in range(maxb):
        mask = nbytes > k
        pos = starts[mask] + k
        out[pos] = (v[mask] & np.uint64(0x7F)).astype(np.uint8)
        v[mask] >>= np.uint64(7)
    out[ends - 1] |= 0x80  # terminator bit on last byte of each value
    return out.tobytes()


def varbyte_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    buf = np.frombuffer(data, dtype=np.uint8)
    is_end = (buf & 0x80) != 0
    ends = np.flatnonzero(is_end)[:n]
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    out = np.zeros(n, dtype=np.uint64)
    maxb = int(lengths.max())
    for k in range(maxb):
        mask = lengths > k
        pos = starts[mask] + k
        out[mask] |= (buf[pos].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * k)
    return out.astype(np.uint32)
