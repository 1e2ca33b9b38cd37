"""StreamVByte codec, numpy-vectorized.

Control stream of 2-bit byte-length codes (4 values per control byte,
value i's code in bits ``2*(i%4)`` of byte ``i//4``) followed by the data
stream of little-endian value bytes — the layout of the reference's
streamvbyte codec (``/root/reference/include/pisa/codec/streamvbyte.hpp``),
vectorized with cumsum/scatter instead of SSSE3 shuffles.
"""

from __future__ import annotations

import numpy as np


def svb_encode(values: np.ndarray) -> bytes:
    values = np.ascontiguousarray(values, dtype=np.uint32)
    n = len(values)
    if n == 0:
        return b""
    # bytes per value: 1..4
    lens = np.ones(n, dtype=np.int64)
    lens[values > 0xFF] = 2
    lens[values > 0xFFFF] = 3
    lens[values > 0xFFFFFF] = 4
    codes = (lens - 1).astype(np.uint8)
    ctrl_len = (n + 3) // 4
    ctrl = np.zeros(ctrl_len * 4, dtype=np.uint8)
    ctrl[:n] = codes
    ctrl = (ctrl.reshape(-1, 4)
            << np.array([0, 2, 4, 6], dtype=np.uint8)).sum(
                axis=1, dtype=np.uint32).astype(np.uint8)
    ends = np.cumsum(lens)
    starts = ends - lens
    data = np.zeros(int(ends[-1]), dtype=np.uint8)
    v = values.astype(np.uint32)
    for k in range(4):
        mask = lens > k
        data[starts[mask] + k] = ((v[mask] >> np.uint32(8 * k))
                                  & np.uint32(0xFF)).astype(np.uint8)
    return ctrl.tobytes() + data.tobytes()


def svb_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    buf = np.frombuffer(data, dtype=np.uint8)
    ctrl_len = (n + 3) // 4
    ctrl = buf[:ctrl_len]
    codes = ((ctrl[:, None] >> np.array([0, 2, 4, 6], dtype=np.uint8))
             & np.uint8(3)).reshape(-1)[:n]
    lens = codes.astype(np.int64) + 1
    ends = np.cumsum(lens)
    starts = ends - lens + ctrl_len
    payload = buf
    out = np.zeros(n, dtype=np.uint32)
    for k in range(4):
        mask = lens > k
        out[mask] |= payload[starts[mask] + k].astype(np.uint32) \
            << np.uint32(8 * k)
    return out
