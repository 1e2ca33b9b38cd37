"""Uniform partitioned Elias-Fano for monotone sequences.

The sequence is cut into fixed-size partitions; each partition is
EF-encoded relative to its base (the previous partition's last value),
so dense regions cost far fewer high bits than one global EF — the
uniform variant of the reference's partitioned sequences
(``/root/reference/include/pisa/sequence/uniform_partitioned_sequence.hpp:306``;
the DP-optimal cut of ``optimal_partition.hpp:121`` is the non-uniform
sibling).

Layout: ``part_size:u16, n_parts:u16,
[base:u64, nbytes:u32] * n_parts, payloads...`` — the fixed-width
directory doubles as the skip index (random access to partition k without
decoding predecessors).
"""

from __future__ import annotations

import struct

import numpy as np

from pisa_ray.codecs.ef import ef_encode, ef_decode

PART_SIZE = 64


def pef_encode(values: np.ndarray) -> bytes:
    values = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(values)
    if n == 0:
        return b""
    n_parts = (n + PART_SIZE - 1) // PART_SIZE
    header = struct.pack("<HH", PART_SIZE, n_parts)
    directory = bytearray()
    payloads = bytearray()
    base = np.uint64(0)
    for p in range(n_parts):
        chunk = values[p * PART_SIZE: (p + 1) * PART_SIZE]
        enc = ef_encode(chunk - base)
        directory += struct.pack("<QI", int(base), len(enc))
        payloads += enc
        base = chunk[-1]
    return header + bytes(directory) + bytes(payloads)


def pef_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    part_size, n_parts = struct.unpack_from("<HH", data, 0)
    pos = 4
    dir_entries = []
    for _ in range(n_parts):
        base, nbytes = struct.unpack_from("<QI", data, pos)
        dir_entries.append((base, nbytes))
        pos += 12
    out = np.empty(n, dtype=np.uint64)
    off = 0
    for p, (base, nbytes) in enumerate(dir_entries):
        cnt = min(part_size, n - p * part_size)
        out[p * part_size: p * part_size + cnt] = \
            ef_decode(data[pos: pos + nbytes], cnt) + np.uint64(base)
        pos += nbytes
        off += cnt
    return out


# ---------------------------------------------------------------------------
# DP-optimal (ε-approximate) partition — the reference's pefopt
# (``optimal_partition.hpp:121``): choose variable-length cuts minimizing
# estimated encoded bits.  Candidate arcs from each cut point are the
# doubling sizes {1, 2, 4, ...} ∪ {n}, giving an O(n log n) shortest-path
# DP whose solution is within a constant factor of optimal (the classic
# approximation; the reference uses ε-windows to the same effect).

_PART_OVERHEAD_BITS = (4 + 8) * 8 + 72  # directory entry + EF header


def _ef_cost_bits(count: int, universe: int) -> float:
    if count == 0:
        return 0.0
    l = max(0, int(np.floor(np.log2(max(1.0, universe / count)))))
    return count * (2 + l) + _PART_OVERHEAD_BITS


def pefopt_encode(values: np.ndarray) -> bytes:
    values = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(values)
    if n == 0:
        return b""
    # shortest path over cut points 0..n with doubling-arc candidates
    INF = float("inf")
    best = np.full(n + 1, INF)
    best[0] = 0.0
    prev = np.zeros(n + 1, dtype=np.int64)
    for i in range(n):
        if best[i] == INF:
            continue
        base = int(values[i - 1]) if i else int(values[0])
        step = 1
        while True:
            j = min(i + step, n)
            u = int(values[j - 1]) - base + 1 if j > i else 1
            c = best[i] + _ef_cost_bits(j - i, max(1, u))
            if c < best[j]:
                best[j] = c
                prev[j] = i
            if j == n:
                break
            step <<= 1
    cuts = [n]
    while cuts[-1] > 0:
        cuts.append(int(prev[cuts[-1]]))
    cuts.reverse()

    out = bytearray(struct.pack("<I", len(cuts) - 1))
    directory = bytearray()
    payloads = bytearray()
    for a, b in zip(cuts[:-1], cuts[1:]):
        base = int(values[a - 1]) if a else int(values[0])
        enc = ef_encode(values[a:b] - np.uint64(base))
        directory += struct.pack("<IQI", b - a, base, len(enc))
        payloads += enc
    return bytes(out) + bytes(directory) + bytes(payloads)


def pefopt_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    (n_parts,) = struct.unpack_from("<I", data, 0)
    pos = 4
    entries = []
    for _ in range(n_parts):
        cnt, base, nbytes = struct.unpack_from("<IQI", data, pos)
        entries.append((cnt, base, nbytes))
        pos += 16
    out = np.empty(n, dtype=np.uint64)
    off = 0
    for cnt, base, nbytes in entries:
        out[off:off + cnt] = ef_decode(data[pos:pos + nbytes], cnt) \
            + np.uint64(base)
        pos += nbytes
        off += cnt
    return out
