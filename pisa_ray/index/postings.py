"""Posting-list segment encoding: blocks + WAND metadata, in one pass.

A *segment* is the postings of one ``(term_id, salt)`` group: docids
strictly ascending.  Hot (stopword-grade) terms are split by the salt into
docid-range subsegments that are encoded independently and concatenated in
salt order at read time — the block framing makes lists mergeable, the same
property the reference relies on when re-assembling lists from blocks
(``/root/reference/include/pisa/block_posting_list.hpp:52-78``).

Per segment we store (mirroring the reference's compressed list + WAND data
in one structure):

* ``doc_payload``  — concatenated encoded blocks of docid gaps − 1; block 0
  encodes its first docid absolute (prev = -1), later blocks delta from the
  previous block's last docid, so any block is decodable given
  ``block_last_docs[b-1]`` (skip-friendly).
* ``freq_payload`` — concatenated encoded blocks of ``tf − 1``.
* ``doc_endpoints`` / ``freq_endpoints`` — byte offsets of block starts.
* ``block_last_docs`` — last docid per block (u64).
* ``block_max_scores`` — per-block max score (float32), computed like the
  reference's fixed-size block partition
  (``/root/reference/include/pisa/wand_utils.hpp:23-54``).
* ``max_score`` — per-segment max score (the per-term max is the max over
  segments, aggregated by the index reader).

Framing conventions (gap−1 / tf−1, 128-int blocks) follow
``/root/reference/include/pisa/block_posting_list.hpp:12-50``.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from pisa_ray.codecs import BLOCK_SIZE, MONOTONE_CODECS, get_codec


def encode_segment(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    scores: Optional[np.ndarray] = None,
    *,
    block_size: int = BLOCK_SIZE,
    codec: str = "bitpack",
    wand_block_size: int = 0,
    wand_lambda: float = 0.0,
) -> Dict[str, object]:
    """Encode one segment (ascending docids). ``scores`` aligned with
    postings enables WAND metadata; pass None to skip (max fields = 0).

    WAND metadata blocks default to the codec blocks; ``wand_block_size``
    selects an independent fixed size, ``wand_lambda`` > 0 the SIGIR'17
    variable partition (stored in wand_last_docs / wand_max_scores)."""
    enc, _ = get_codec(codec)
    monotone = codec in MONOTONE_CODECS
    n = len(doc_ids)
    if n == 0:
        raise ValueError("empty segment")
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint32)

    gaps = np.empty(n, dtype=np.uint64)
    # block 0's first entry is 0: the absolute first docid lives in the
    # stored first_doc column, so the payload never carries it — an
    # absolute id in the block would force the whole block's bit width up
    # (a BP-reordered index would look BIGGER without this)
    gaps[0] = 0
    np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:])
    if n > 1 and gaps[1:].min() == 0:
        raise ValueError(
            "duplicate doc_id within a posting segment — the corpus has "
            "duplicate document keys (e.g. repeated urls); dedup upstream"
        )
    gaps[1:] -= 1
    if gaps.max() > 0xFFFFFFFF:
        raise ValueError(
            "docid gap exceeds u32; use shard-local docids (PISA-compatible) "
            "or a narrower salt range"
        )
    gaps32 = gaps.astype(np.uint32)
    tfs_m1 = tfs - 1

    nblocks = (n + block_size - 1) // block_size
    doc_chunks, freq_chunks = [], []
    doc_endpoints = np.zeros(nblocks + 1, dtype=np.uint32)
    freq_endpoints = np.zeros(nblocks + 1, dtype=np.uint32)
    for b in range(nblocks):
        lo, hi = b * block_size, min((b + 1) * block_size, n)
        if monotone:
            base = doc_ids[lo - 1] + np.uint64(1) if lo else doc_ids[0]
            doc_chunks.append(enc(doc_ids[lo:hi] - base))
            freq_chunks.append(enc(np.cumsum(tfs[lo:hi], dtype=np.uint64)))
        else:
            doc_chunks.append(enc(gaps32[lo:hi]))
            freq_chunks.append(enc(tfs_m1[lo:hi]))
        doc_endpoints[b + 1] = doc_endpoints[b] + len(doc_chunks[-1])
        freq_endpoints[b + 1] = freq_endpoints[b] + len(freq_chunks[-1])

    block_last_docs = doc_ids[np.minimum(
        np.arange(1, nblocks + 1) * block_size, n) - 1]

    if scores is not None:
        scores = scores.astype(np.float32, copy=False)
        pad = nblocks * block_size - n
        padded = np.pad(scores, (0, pad), constant_values=-np.inf) if pad else scores
        block_max_scores = padded.reshape(nblocks, block_size).max(axis=1)
        max_score = np.float32(scores.max())
    else:
        block_max_scores = np.zeros(nblocks, dtype=np.float32)
        max_score = np.float32(0.0)

    wand_last = np.empty(0, dtype=np.uint64)
    wand_max = np.empty(0, dtype=np.float32)
    if scores is not None and wand_lambda > 0:
        wand_last, wand_max = wand_partition_variable(
            doc_ids, scores, wand_lambda)
    elif scores is not None and wand_block_size:
        wand_last, wand_max = wand_partition_fixed(
            doc_ids, scores, wand_block_size)

    return {
        "df": np.int64(n),
        "first_doc": doc_ids[0],
        "last_doc": doc_ids[-1],
        "doc_payload": b"".join(doc_chunks),
        "freq_payload": b"".join(freq_chunks),
        "doc_endpoints": doc_endpoints,
        "freq_endpoints": freq_endpoints,
        "block_last_docs": block_last_docs,
        "block_max_scores": block_max_scores,
        "wand_last_docs": wand_last,
        "wand_max_scores": wand_max,
        "max_score": max_score,
    }


class SegmentView:
    """Lazily block-decodable view over one encoded segment."""

    __slots__ = ("n", "block_size", "doc_payload", "freq_payload",
                 "doc_endpoints", "freq_endpoints", "block_last_docs",
                 "block_max_scores", "wand_last_docs", "wand_max_scores",
                 "max_score", "first_doc", "_dec", "_monotone")

    def __init__(self, row: Dict[str, object], *, block_size: int = BLOCK_SIZE,
                 codec: str = "bitpack"):
        _, self._dec = get_codec(codec)
        self._monotone = codec in MONOTONE_CODECS
        self.n = int(row["df"])
        self.first_doc = np.uint64(row["first_doc"])
        self.block_size = block_size
        self.doc_payload = row["doc_payload"]
        self.freq_payload = row["freq_payload"]
        self.doc_endpoints = np.asarray(row["doc_endpoints"], dtype=np.uint32)
        self.freq_endpoints = np.asarray(row["freq_endpoints"], dtype=np.uint32)
        self.block_last_docs = np.asarray(row["block_last_docs"], dtype=np.uint64)
        self.block_max_scores = np.asarray(row["block_max_scores"], dtype=np.float32)
        wl = row.get("wand_last_docs") if hasattr(row, "get") else None
        wm = row.get("wand_max_scores") if hasattr(row, "get") else None
        if wl is not None and len(wl):
            self.wand_last_docs = np.asarray(wl, dtype=np.uint64)
            self.wand_max_scores = np.asarray(wm, dtype=np.float32)
        else:
            # wand blocks == codec blocks (the default coupling)
            self.wand_last_docs = self.block_last_docs
            self.wand_max_scores = self.block_max_scores
        self.max_score = float(row["max_score"])

    @property
    def num_blocks(self) -> int:
        return len(self.block_last_docs)

    def block_len(self, b: int) -> int:
        return min((b + 1) * self.block_size, self.n) - b * self.block_size

    def decode_block_docs(self, b: int) -> np.ndarray:
        """Absolute docids of block ``b`` (u64)."""
        lo, hi = int(self.doc_endpoints[b]), int(self.doc_endpoints[b + 1])
        vals = self._dec(self.doc_payload[lo:hi], self.block_len(b)).astype(np.uint64)
        base = self.first_doc if b == 0 \
            else self.block_last_docs[b - 1] + np.uint64(1)
        if self._monotone:
            return vals + base
        vals[0] += base
        vals[1:] += 1
        return np.cumsum(vals, dtype=np.uint64)

    def decode_block_freqs(self, b: int) -> np.ndarray:
        lo, hi = int(self.freq_endpoints[b]), int(self.freq_endpoints[b + 1])
        vals = self._dec(self.freq_payload[lo:hi], self.block_len(b))
        if self._monotone:
            return np.diff(vals.astype(np.uint64),
                           prepend=np.uint64(0)).astype(np.uint32)
        return vals + 1

    def decode_docs(self) -> np.ndarray:
        if self.num_blocks == 0:
            return np.empty(0, dtype=np.uint64)
        return np.concatenate([self.decode_block_docs(b) for b in range(self.num_blocks)])

    def decode_freqs(self) -> np.ndarray:
        if self.num_blocks == 0:
            return np.empty(0, dtype=np.uint32)
        return np.concatenate([self.decode_block_freqs(b) for b in range(self.num_blocks)])


# ---------------------------------------------------------------------------
# WAND block partitions decoupled from codec blocks
#
# The reference's score metadata can use fixed-size blocks of a different
# size than the codec (wand_utils.hpp:23-54) or variable-sized blocks chosen
# to minimize the slack between per-block maxes and actual scores plus a
# per-block cost λ (score_opt_partition, Mallia et al., SIGIR'17).  Here the
# variable partition is an exact bounded-window DP over the same objective:
#   cost(block) = Σ_i (max(block) − score_i) + λ·n,   block length ≤ max_len
# Dynamic pruning stays correct under ANY partition (block maxes are upper
# bounds); the partition only affects pruning efficiency.

def wand_partition_fixed(doc_ids: np.ndarray, scores: np.ndarray,
                         size: int):
    n = len(doc_ids)
    nblocks = (n + size - 1) // size
    last = doc_ids[np.minimum(np.arange(1, nblocks + 1) * size, n) - 1]
    pad = nblocks * size - n
    padded = np.pad(scores.astype(np.float32), (0, pad),
                    constant_values=-np.inf) if pad else scores.astype(np.float32)
    maxes = padded.reshape(nblocks, size).max(axis=1)
    return last.astype(np.uint64), maxes.astype(np.float32)


def wand_partition_variable(doc_ids: np.ndarray, scores: np.ndarray,
                            lam: float, max_len: int = 256):
    """Exact DP with block length capped at max_len: O(n·max_len)."""
    n = len(scores)
    s = scores.astype(np.float64)
    prefix = np.concatenate(([0.0], np.cumsum(s)))
    best = np.full(n + 1, np.inf)
    best[0] = 0.0
    back = np.zeros(n + 1, dtype=np.int64)
    for j in range(1, n + 1):
        lo = max(0, j - max_len)
        # running max of s[i:j] as i decreases
        m = -np.inf
        for i in range(j - 1, lo - 1, -1):
            if s[i] > m:
                m = s[i]
            cost = best[i] + m * (j - i) - (prefix[j] - prefix[i]) + lam
            if cost < best[j]:
                best[j] = cost
                back[j] = i
    bounds = []
    j = n
    while j > 0:
        bounds.append(j)
        j = int(back[j])
    bounds = bounds[::-1]
    last = doc_ids[np.array(bounds, dtype=np.int64) - 1].astype(np.uint64)
    maxes = np.array([s[a:b].max() for a, b in
                      zip([0] + bounds[:-1], bounds)], dtype=np.float32)
    return last, maxes
