"""Group Varint (VarintGB) codec, numpy-vectorized.

Wire format of the reference's ``VarIntGB<false>``
(``/root/reference/include/pisa/codec/varintgb.hpp:15-150``): values in
groups of 4; each group is one key byte holding four 2-bit
``(byte_len - 1)`` codes (value ``i``'s code at bits ``2*i``) followed by
the values' little-endian bytes.  A trailing partial group uses the same
key-byte layout with only the leading codes populated.

Encoded with a cumsum/scatter over per-value byte lengths; decoded by
expanding the key bytes back to lengths and gathering with the same
byte-plane loop the other vbyte codecs use.
"""

from __future__ import annotations

import numpy as np


def vgb_encode(values: np.ndarray) -> bytes:
    values = np.ascontiguousarray(values, dtype=np.uint32)
    n = len(values)
    if n == 0:
        return b""
    lens = np.ones(n, dtype=np.int64)
    lens[values > 0xFF] = 2
    lens[values > 0xFFFF] = 3
    lens[values > 0xFFFFFF] = 4
    ngroups = (n + 3) // 4
    codes = np.zeros(ngroups * 4, dtype=np.uint8)
    codes[:n] = (lens - 1).astype(np.uint8)
    keys = (codes.reshape(-1, 4)
            << np.array([0, 2, 4, 6], dtype=np.uint8)).sum(
                axis=1, dtype=np.uint32).astype(np.uint8)
    # data offsets: each value's bytes follow its group's key byte
    ends = np.cumsum(lens)
    starts = ends - lens
    # shift every value's start by the number of key bytes at or before it
    group_of = np.arange(n, dtype=np.int64) // 4
    starts += group_of + 1
    total = int(ends[-1]) + ngroups
    data = np.zeros(total, dtype=np.uint8)
    # key byte positions: group g's key sits before its first value's bytes
    first_of_group = np.arange(0, n, 4, dtype=np.int64)
    key_pos = starts[first_of_group] - 1
    data[key_pos] = keys
    for k in range(4):
        mask = lens > k
        if not mask.any():
            break
        data[starts[mask] + k] = ((values[mask] >> np.uint32(8 * k))
                                  & np.uint32(0xFF)).astype(np.uint8)
    return data.tobytes()


def vgb_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    buf = np.frombuffer(data, dtype=np.uint8)
    ngroups = (n + 3) // 4
    # key-byte positions depend on previous groups' data lengths → one
    # sequential pass over GROUPS (n/4 steps), vectorized within
    lens = np.zeros(n, dtype=np.int64)
    key_pos = np.zeros(ngroups, dtype=np.int64)
    pos = 0
    shifts = np.array([0, 2, 4, 6], dtype=np.uint8)
    for g in range(ngroups):
        key_pos[g] = pos
        k = int(buf[pos])
        cnt = min(4, n - g * 4)
        glens = ((k >> shifts[:cnt]) & 3).astype(np.int64) + 1
        lens[g * 4:g * 4 + cnt] = glens
        pos += 1 + int(glens.sum())
    ends = np.cumsum(lens)
    starts = ends - lens
    starts += np.arange(n, dtype=np.int64) // 4 + 1
    out = np.zeros(n, dtype=np.uint32)
    for k in range(4):
        mask = lens > k
        if not mask.any():
            break
        out[mask] |= buf[starts[mask] + k].astype(np.uint32) \
            << np.uint32(8 * k)
    return out
