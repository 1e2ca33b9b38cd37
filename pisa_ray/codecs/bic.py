"""Binary interpolative coding for strictly increasing sequences.

Recursively encodes the middle element of the remaining range with a
minimal binary code whose width shrinks as the bounds tighten — Moffat &
Stuiver's scheme, the reference's ``block_interpolative`` codec
(``/root/reference/include/pisa/codec/integer_codes.hpp`` +
``interpolative_coding.hpp``).  Sequential by nature; used per ≤128-int
block so the Python recursion stays shallow and short.

Applied as a MONOTONE codec (docids directly, freqs as prefix sums, both
strictly increasing).
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    __slots__ = ("bits",)

    def __init__(self):
        self.bits: list = []

    def write(self, value: int, width: int) -> None:
        if width <= 0:
            return
        for k in range(width - 1, -1, -1):
            self.bits.append((value >> k) & 1)

    def getvalue(self) -> bytes:
        arr = np.array(self.bits, dtype=np.uint8)
        return np.packbits(arr).tobytes()


class _BitReader:
    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, width: int) -> int:
        if width <= 0:
            return 0
        v = 0
        for b in self.bits[self.pos: self.pos + width]:
            v = (v << 1) | int(b)
        self.pos += width
        return v


def _width(r: int) -> int:
    return int(r).bit_length() if r > 0 else 0


def _encode_range(w: _BitWriter, vals: np.ndarray, lo: int, hi: int) -> None:
    n = len(vals)
    if n == 0:
        return
    mid_i = n // 2
    mid = int(vals[mid_i])
    # mid ∈ [lo + mid_i, hi - (n - 1 - mid_i)]
    a = lo + mid_i
    b = hi - (n - 1 - mid_i)
    w.write(mid - a, _width(b - a))
    _encode_range(w, vals[:mid_i], lo, mid - 1)
    _encode_range(w, vals[mid_i + 1:], mid + 1, hi)


def _decode_range(r: _BitReader, out: np.ndarray, oi: int, n: int,
                  lo: int, hi: int) -> None:
    if n == 0:
        return
    mid_i = n // 2
    a = lo + mid_i
    b = hi - (n - 1 - mid_i)
    mid = a + r.read(_width(b - a))
    out[oi + mid_i] = mid
    _decode_range(r, out, oi, mid_i, lo, mid - 1)
    _decode_range(r, out, oi + mid_i + 1, n - mid_i - 1, mid + 1, hi)


def bic_encode(values: np.ndarray) -> bytes:
    """Encode a strictly increasing uint64 sequence."""
    values = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(values)
    if n == 0:
        return b""
    lo = int(values[0])
    hi = int(values[-1])
    head = lo.to_bytes(8, "little") + hi.to_bytes(8, "little")
    w = _BitWriter()
    _encode_range(w, values[1:-1].astype(np.int64), lo + 1, hi - 1)
    return head + w.getvalue()


def bic_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lo = int.from_bytes(data[:8], "little")
    hi = int.from_bytes(data[8:16], "little")
    out = np.empty(n, dtype=np.int64)
    out[0] = lo
    out[n - 1] = hi
    if n > 2:
        r = _BitReader(data[16:])
        _decode_range(r, out, 1, n - 2, lo + 1, hi - 1)
    elif n == 1:
        pass
    return out.astype(np.uint64)
