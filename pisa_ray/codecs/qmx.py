"""QMX codec (Quantities, Multipliers and eXtractor — Trotman, ADCS'14).

The scheme the reference wraps via an external SIMD library
(``/root/reference/include/pisa/codec/qmx.hpp``): integers are packed
into 128-bit payload words at a per-word bit width, and the width
selectors are run-length encoded in a *separate* selector stream —
one byte per run, high nibble = selector, low nibble = run length − 1
(≤16 consecutive payload words sharing a width).  Splitting payload
from selectors is what lets the SIMD original decode whole 128-bit
registers without per-word branching; here the same split lets numpy
decode each run as ONE vectorized unpackbits/dot over ``run × count``
slots.

This is a scheme-faithful reimplementation, not a byte-identical port:
the original's exact width table and word order are register-layout
details of the SSE library (not vendored by the reference either);
framing below is our own, applied consistently by encode/decode.

Width table (selector → bits/integer; count/word = ⌊128/width⌋):

    0 → 0-bit   (a word of 128 zeros with NO payload bytes — zero runs,
                 e.g. the tf−1 stream of singleton terms, cost 1 byte
                 per 2048 zeros)
    1..15 → [1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 16, 21, 24, 28, 32]

Wire layout: ``u32 n_selector_bytes ‖ selector bytes ‖ payload`` where
payload is 16 bytes per non-zero-width word.  A trailing word may fill
only its leading slots (decode stops after ``n`` values).
"""

from __future__ import annotations

import numpy as np

_WIDTHS = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 16, 21, 24, 28, 32],
                   dtype=np.uint32)
# integers per 128-bit word (width 0 handled specially: 128 zeros, no payload)
_COUNTS = np.array([128 if w == 0 else 128 // w for w in _WIDTHS],
                   dtype=np.int64)
_POW2 = [np.uint64(1) << np.uint64(w) for w in _WIDTHS]


def _width_for(v: np.uint64) -> int:
    """Smallest selector whose width fits value ``v``."""
    for sel in range(len(_WIDTHS)):
        if v < _POW2[sel]:
            return sel
    raise ValueError("qmx encodes values < 2^32 only")


def qmx_encode(values: np.ndarray) -> bytes:
    values = np.ascontiguousarray(values, dtype=np.uint32)
    n = len(values)
    if n == 0:
        return b""
    v64 = values.astype(np.uint64)
    sels: list = []            # one selector per payload word, in order
    payload = bytearray()
    i = 0
    while i < n:
        rest = n - i
        # greedy: width that fits the next count(w) values, preferring
        # narrower words; a zero run takes the 0-width payload-free word
        take = min(128, rest)
        chunk = v64[i:i + take]
        if not chunk.any():
            sels.append(0)
            i += take
            continue
        # smallest selector whose word actually fits its own slot count:
        # narrower width → more slots → larger prefix max → feasibility is
        # monotone in sel, so the first feasible sel (scanning up from the
        # width the first value alone needs) is the minimal one
        sel = _width_for(v64[i])
        while sel < len(_WIDTHS) - 1:
            cnt = min(int(_COUNTS[sel]), rest)
            if v64[i:i + cnt].max() < _POW2[sel]:
                break
            sel += 1
        w = int(_WIDTHS[sel])
        cnt = min(int(_COUNTS[sel]), rest)
        slot = v64[i:i + cnt]
        # bits of each slot, LSB-first, concatenated little-endian
        bits = ((slot[:, None] >> np.arange(w, dtype=np.uint64)) &
                np.uint64(1)).astype(np.uint8).ravel()
        word = np.zeros(128, dtype=np.uint8)
        word[:len(bits)] = bits
        payload += np.packbits(word, bitorder="little").tobytes()
        sels.append(sel)
        i += cnt
    # run-length encode the selector stream (runs of ≤16 equal selectors)
    sel_bytes = bytearray()
    j = 0
    while j < len(sels):
        run = 1
        while (run < 16 and j + run < len(sels)
               and sels[j + run] == sels[j]):
            run += 1
        sel_bytes.append((sels[j] << 4) | (run - 1))
        j += run
    head = np.uint32(len(sel_bytes)).tobytes()
    return head + bytes(sel_bytes) + bytes(payload)


def qmx_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    n_sel = int(np.frombuffer(data[:4], dtype=np.uint32)[0])
    sel_bytes = np.frombuffer(data[4:4 + n_sel], dtype=np.uint8)
    payload = np.frombuffer(data[4 + n_sel:], dtype=np.uint8)
    out = np.empty(n, dtype=np.uint32)
    got = 0
    off = 0  # payload byte offset
    for b in sel_bytes:
        sel = int(b) >> 4
        run = (int(b) & 0xF) + 1
        w = int(_WIDTHS[sel])
        cnt = int(_COUNTS[sel])
        if w == 0:
            take = min(run * cnt, n - got)
            out[got:got + take] = 0
            got += take
            if got >= n:
                break
            continue
        nb = run * 16
        bits = np.unpackbits(payload[off:off + nb],
                             bitorder="little").reshape(run, 128)
        off += nb
        # first cnt*w bits of each word are the used slots
        slots = bits[:, :cnt * w].reshape(run * cnt, w)
        vals = slots @ (np.uint64(1) << np.arange(w, dtype=np.uint64))
        take = min(run * cnt, n - got)
        out[got:got + take] = vals[:take].astype(np.uint32)
        got += take
        if got >= n:
            break
    if got < n:
        raise ValueError("qmx stream truncated")
    return out
