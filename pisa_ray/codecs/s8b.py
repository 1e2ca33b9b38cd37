"""Simple8b codec: pack runs of small integers into 64-bit words.

Each u64 word carries a 4-bit selector (high bits) choosing how many
values at what bit width fill the remaining 60 bits — the scheme of the
reference's simple8b codec
(``/root/reference/include/pisa/codec/simple8b.hpp``).  Selector table
(items × width): the classic Anh–Moffat layout with two run-length
selectors for zeros.

The packer walks word by word (greedy longest-fit); with 128-value blocks
this is a short Python loop per block, while the per-word pack/unpack is
vectorized.
"""

from __future__ import annotations

import numpy as np

# selector -> (items per word, bit width)
_TABLE = [(240, 0), (120, 0), (60, 1), (30, 2), (20, 3), (15, 4), (12, 5),
          (10, 6), (8, 7), (7, 8), (6, 10), (5, 12), (4, 15), (3, 20),
          (2, 30), (1, 60)]


def s8b_encode(values: np.ndarray) -> bytes:
    values = np.ascontiguousarray(values, dtype=np.uint64)
    if len(values) == 0:
        return b""
    if values.max() >= (1 << 32):
        # decode returns uint32 (the block-codec contract); larger values
        # would silently truncate on round-trip
        raise ValueError("simple8b: value exceeds 32 bits")
    bitlen = np.zeros(len(values), dtype=np.int64)
    nz = values > 0
    if nz.any():
        # vectorized bit_length via log2 on float64 is exact for < 2^53;
        # top off with a correction pass for the rare larger values
        v = values[nz]
        bl = np.floor(np.log2(v.astype(np.float64))).astype(np.int64) + 1
        # correct float rounding at powers of two boundaries
        too_low = (np.uint64(1) << bl.astype(np.uint64)) <= v
        bl[too_low] += 1
        too_high = (np.uint64(1) << (bl - 1).astype(np.uint64)) > v
        bl[too_high] -= 1
        bitlen[nz] = bl
    words = []
    i, n = 0, len(values)
    while i < n:
        emitted = False
        # greedy densest-first: a selector may be used either completely
        # full (items values) or as the FINAL word with a partial tail —
        # decode stops at n, so only the last word may be short
        for sel, (items, width) in enumerate(_TABLE):
            take = min(items, n - i)
            if take < items and i + take != n:
                continue
            if bitlen[i:i + take].max(initial=0) > width:
                continue
            word = np.uint64(sel) << np.uint64(60)
            if width > 0:
                chunk = np.zeros(items, dtype=np.uint64)
                chunk[:take] = values[i:i + take]
                shifts = np.arange(items, dtype=np.uint64) * np.uint64(width)
                word |= np.bitwise_or.reduce(chunk << shifts)
            words.append(word)
            i += take
            emitted = True
            break
        if not emitted:
            raise ValueError("simple8b: no selector fits")
    return np.asarray(words, dtype=np.uint64).tobytes()


def s8b_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    words = np.frombuffer(data, dtype=np.uint64)
    out = np.empty(n, dtype=np.uint64)
    pos = 0
    for w in words:
        sel = int(w >> np.uint64(60))
        items, width = _TABLE[sel]
        take = min(items, n - pos)
        if width == 0:
            out[pos:pos + take] = 0
        else:
            shifts = (np.arange(take, dtype=np.uint64) * np.uint64(width))
            mask = np.uint64((1 << width) - 1)
            out[pos:pos + take] = (w >> shifts) & mask
        pos += take
        if pos >= n:
            break
    return out.astype(np.uint32)
