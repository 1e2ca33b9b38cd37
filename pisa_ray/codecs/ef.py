"""Elias-Fano encoding for monotone sequences, numpy-vectorized.

The capability analogue of the reference's EF-coded sequences
(``/root/reference/include/pisa/codec/compact_elias_fano.hpp:23-398``):
values are split into ``l`` low bits (packed contiguously) and high bits
(unary-coded in a bitvector at position ``i + (v_i >> l)``), with
``l = max(0, floor(log2(u/n)))``.

Used as a *monotone* block codec: docids are encoded directly (they are
ascending within a block) and frequencies as their prefix sums (strictly
increasing since tf ≥ 1) — the same trick the reference's ``freq_index``
family uses.  Layout per block: ``u:u64 LE, l:u8, low-bits, high-bits``.
"""

from __future__ import annotations

import numpy as np


def ef_encode(values: np.ndarray) -> bytes:
    """Encode a non-decreasing uint64 sequence."""
    values = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(values)
    if n == 0:
        return b""
    u = int(values[-1]) + 1
    l = max(0, int(np.floor(np.log2(max(1.0, u / n)))))
    out = bytearray()
    out += int(u).to_bytes(8, "little")
    out.append(l)
    if l > 0:
        low = values & np.uint64((1 << l) - 1)
        # pack n l-bit values MSB-first
        bits = np.unpackbits(low.astype(">u8").view(np.uint8).reshape(n, 8),
                             axis=1)[:, 64 - l:]
        out += np.packbits(bits.reshape(-1)).tobytes()
    highs = (values >> np.uint64(l)).astype(np.int64)
    nbits_high = n + int(highs[-1]) + 1
    hv = np.zeros(nbits_high, dtype=np.uint8)
    hv[np.arange(n) + highs] = 1
    out += np.packbits(hv).tobytes()
    return bytes(out)


def ef_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    buf = memoryview(data)
    u = int.from_bytes(buf[:8], "little")
    l = buf[8]
    pos = 9
    if l > 0:
        nbytes_low = (n * l + 7) // 8
        bits = np.unpackbits(np.frombuffer(buf[pos: pos + nbytes_low],
                                           dtype=np.uint8))[: n * l]
        mat = np.zeros((n, 64), dtype=np.uint8)
        mat[:, 64 - l:] = bits.reshape(n, l)
        low = np.packbits(mat, axis=1).view(">u8").astype(np.uint64).reshape(n)
        pos += nbytes_low
    else:
        low = np.zeros(n, dtype=np.uint64)
    hbits = np.unpackbits(np.frombuffer(buf[pos:], dtype=np.uint8))
    ones = np.flatnonzero(hbits)[:n]
    highs = (ones - np.arange(n)).astype(np.uint64)
    return (highs << np.uint64(l)) | low
