"""Fixed-width bit packing (SIMD-BP128-style), numpy-vectorized.

Layout per block: 1 header byte = bit width ``b`` (0..32), then
``ceil(n*b/8)`` bytes of packed values (each value's low ``b`` bits,
big-endian within the value, bitstream packed MSB-first).  ``b == 0``
means all values are zero and no payload follows.

This is the capability analogue of the reference's SIMD-BP128 block codec
(``/root/reference/include/pisa/codec/simdbp.hpp:12-39``): same
width-byte + packed-words idea, vectorized here with
``np.unpackbits``/``np.packbits`` instead of SIMD intrinsics.
"""

from __future__ import annotations

import numpy as np


def bitpack_encode(values: np.ndarray) -> bytes:
    values = np.ascontiguousarray(values, dtype=np.uint32)
    n = len(values)
    if n == 0:
        return b""
    maxv = int(values.max())
    b = maxv.bit_length()
    if b == 0:
        return bytes([0])
    # bits matrix: n x 32 (big-endian bit order per value)
    bits = np.unpackbits(values.astype(">u4").view(np.uint8).reshape(n, 4), axis=1)
    payload = np.packbits(bits[:, 32 - b:].reshape(-1))
    return bytes([b]) + payload.tobytes()


def bitpack_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    buf = np.frombuffer(data, dtype=np.uint8)
    b = int(buf[0])
    if b == 0:
        return np.zeros(n, dtype=np.uint32)
    nbits = n * b
    bits = np.unpackbits(buf[1: 1 + (nbits + 7) // 8])[:nbits].reshape(n, b)
    out = np.zeros((n, 32), dtype=np.uint8)
    out[:, 32 - b:] = bits
    return np.packbits(out, axis=1).view(">u4").astype(np.uint32).reshape(n)


def bitpack_nbytes(n: int, maxv: int) -> int:
    """Encoded size without encoding (for planning)."""
    if n == 0:
        return 0
    b = int(maxv).bit_length()
    return 1 + ((n * b + 7) // 8 if b else 0)
