"""OptPFor-style patched frame-of-reference codec.

Per block: choose the bit width ``b`` that minimizes total encoded size
when values that do not fit ``b`` bits are patched as exceptions — the
optimization the reference's OptPFor does per 128-int block
(``/root/reference/include/pisa/codec/block_codecs.hpp:130-341``).

Layout: ``b:u8, n_exc:u8, bitpacked(low b bits of every value),
exc_positions:u8[n_exc], varbyte(high parts of exceptions)``.
Block length ≤ 256 keeps exception positions in one byte.
"""

from __future__ import annotations

import numpy as np

from pisa_ray.codecs.bitpack import bitpack_encode, bitpack_decode
from pisa_ray.codecs.varbyte import varbyte_encode, varbyte_decode


def _bit_lengths(values: np.ndarray) -> np.ndarray:
    bl = np.zeros(len(values), dtype=np.int64)
    nz = values > 0
    if nz.any():
        v = values[nz].astype(np.uint64)
        e = np.floor(np.log2(v.astype(np.float64))).astype(np.int64) + 1
        e[(np.uint64(1) << e.astype(np.uint64)) <= v] += 1
        e[(np.uint64(1) << np.maximum(e - 1, 0).astype(np.uint64)) > v] -= 1
        bl[nz] = e
    return bl


def pfor_encode(values: np.ndarray) -> bytes:
    values = np.ascontiguousarray(values, dtype=np.uint32)
    n = len(values)
    if n == 0:
        return b""
    if n > 256:
        raise ValueError("pfor: block too long (positions are u8)")
    bl = _bit_lengths(values)
    maxb = int(bl.max())
    # exact cost per candidate width: sorted bit lengths → exceptions are
    # the values with bitlen > b
    best_b, best_cost = maxb, None
    for b in range(maxb + 1):
        n_exc = int((bl > b).sum())
        if n_exc > 255:
            continue
        # low-bits payload + positions + ~2 bytes/exception high part
        exc_high_bytes = 0
        if n_exc:
            highs = (values[bl > b].astype(np.uint64) >> np.uint64(b))
            exc_high_bytes = int(np.maximum(
                (_bit_lengths(highs) + 6) // 7, 1).sum())
        cost = 2 + 1 + (n * b + 7) // 8 + n_exc + exc_high_bytes
        if best_cost is None or cost < best_cost:
            best_b, best_cost = b, cost
    b = best_b
    mask = np.uint32((1 << b) - 1) if b else np.uint32(0)
    low = (values & mask) if b else np.zeros(n, dtype=np.uint32)
    exc_idx = np.flatnonzero(bl > b)
    out = bytearray([b, len(exc_idx)])
    out += bitpack_payload(low, b)
    out += exc_idx.astype(np.uint8).tobytes()
    if len(exc_idx):
        highs = (values[exc_idx].astype(np.uint64) >> np.uint64(b)) \
            .astype(np.uint32)
        out += varbyte_encode(highs)
    return bytes(out)


def bitpack_payload(values: np.ndarray, b: int) -> bytes:
    """Pack the low ``b`` bits of each value, MSB-first (no width byte)."""
    n = len(values)
    if b == 0 or n == 0:
        return b""
    bits = np.unpackbits(values.astype(">u4").view(np.uint8).reshape(n, 4),
                         axis=1)
    return np.packbits(bits[:, 32 - b:].reshape(-1)).tobytes()


def bitpack_payload_decode(data, n: int, b: int) -> np.ndarray:
    if b == 0 or n == 0:
        return np.zeros(n, dtype=np.uint32)
    nbits = n * b
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8,
                                       count=(nbits + 7) // 8))[:nbits]
    mat = np.zeros((n, 32), dtype=np.uint8)
    mat[:, 32 - b:] = bits.reshape(n, b)
    return np.packbits(mat, axis=1).view(">u4").astype(np.uint32).reshape(n)


def pfor_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    buf = memoryview(data)
    b, n_exc = buf[0], buf[1]
    pos = 2
    nbytes_low = (n * b + 7) // 8
    out = bitpack_payload_decode(buf[pos: pos + nbytes_low], n, b)
    pos += nbytes_low
    if n_exc:
        idx = np.frombuffer(buf[pos: pos + n_exc], dtype=np.uint8) \
            .astype(np.int64)
        pos += n_exc
        highs = varbyte_decode(bytes(buf[pos:]), n_exc)
        out[idx] |= (highs.astype(np.uint32) << np.uint32(b))
    return out
