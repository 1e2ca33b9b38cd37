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
