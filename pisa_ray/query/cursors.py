"""Posting-list cursors: sequential + skip (next_geq) access with lazy
block decoding and block-max metadata.

Re-expresses the reference's cursor hierarchy (ScoredCursor →
MaxScoredCursor → BlockMaxScoredCursor,
``/root/reference/include/pisa/cursor/*.hpp``) and the block-skipping
posting cursor kernel (``include/pisa/block_posting_list.hpp:80-319``) over
our segment layout: a term's blocks are the concatenation of its segments'
blocks in docid order; ``next_geq`` binary-searches the flat
``block_last_docs`` array, decodes only the target block, and exposes the
current block's (last_doc, max_score) for Block-Max algorithms.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from pisa_ray.index.reader import PostingList


class Cursor:
    """One term's cursor.  ``docid() == end_sentinel`` marks exhaustion."""

    __slots__ = ("pl", "scorer", "max_score", "end_sentinel", "q_weight",
                 "_seg_of_block", "_idx_in_seg", "_block_last", "_block_max",
                 "_wand_last", "_wand_max",
                 "_block_start", "n", "_b", "_docs", "_freqs", "_scores",
                 "_i", "_exhausted", "_wb")

    def __init__(self, pl: PostingList, term_scorer, end_sentinel: int,
                 q_weight: float = 1.0):
        self.pl = pl
        self.scorer = term_scorer
        self.q_weight = q_weight
        self.max_score = pl.max_score * q_weight
        self.end_sentinel = end_sentinel
        segs, blocks = [], []
        starts = []
        pos = 0
        for si, seg in enumerate(pl.segments):
            for b in range(seg.num_blocks):
                segs.append(si)
                blocks.append(b)
                starts.append(pos)
                pos += seg.block_len(b)
        self.n = pos
        self._seg_of_block = np.asarray(segs, dtype=np.int32)
        self._idx_in_seg = np.asarray(blocks, dtype=np.int32)
        self._block_last = np.concatenate(
            [seg.block_last_docs for seg in pl.segments]).astype(np.uint64)
        self._block_max = np.concatenate(
            [seg.block_max_scores for seg in pl.segments]).astype(np.float32)
        # wand-data blocks may differ from codec blocks (fixed other size
        # or SIGIR'17 variable partition); the block-max API uses these
        self._wand_last = np.concatenate(
            [seg.wand_last_docs for seg in pl.segments]).astype(np.uint64)
        self._wand_max = np.concatenate(
            [seg.wand_max_scores for seg in pl.segments]).astype(np.float32)
        self._block_start = np.asarray(starts, dtype=np.int64)
        self._b = -1
        self._docs = self._freqs = self._scores = None
        self._i = 0
        self._exhausted = False
        self._wb = 0  # wand-data block pointer (shallow moves, no decode)
        self._load_block(0)

    # -- block machinery ----------------------------------------------------
    def _load_block(self, b: int) -> None:
        if b >= len(self._block_last):
            self._exhausted = True
            return
        seg = self.pl.segments[int(self._seg_of_block[b])]
        ib = int(self._idx_in_seg[b])
        self._b = b
        self._docs = seg.decode_block_docs(ib)
        self._freqs = None  # lazy: only decoded when freq()/score() is called
        self._scores = None
        self._i = 0

    def _ensure_freqs(self) -> None:
        if self._freqs is None:
            seg = self.pl.segments[int(self._seg_of_block[self._b])]
            self._freqs = seg.decode_block_freqs(int(self._idx_in_seg[self._b]))

    # -- positional API -----------------------------------------------------
    def docid(self) -> int:
        if self._exhausted:
            return self.end_sentinel
        return int(self._docs[self._i])

    def freq(self) -> int:
        self._ensure_freqs()
        return int(self._freqs[self._i])

    def score(self, doc_lens: np.ndarray) -> float:
        """Score the current posting (doc_lens = dense doc-length array)."""
        self._ensure_freqs()
        if self._scores is None:
            dl = doc_lens[self._docs.astype(np.int64)]
            self._scores = self.scorer(self._freqs, dl) * self.q_weight
        return float(self._scores[self._i])

    def next(self) -> None:
        if self._exhausted:
            return
        self._i += 1
        if self._i >= len(self._docs):
            self._load_block(self._b + 1)

    def next_geq(self, target: int) -> None:
        """Skip to the first posting with docid >= target (block-skip via
        the flat block_last_docs, then in-block binary search)."""
        if self._exhausted:
            return
        t = np.uint64(target)
        if t <= self._docs[-1]:
            if self._docs[self._i] >= t:
                return
            b = self._b
        else:
            b = int(np.searchsorted(self._block_last, t, side="left"))
            if b >= len(self._block_last):
                self._exhausted = True
                return
            if b != self._b:
                self._load_block(b)
        self._i = int(np.searchsorted(self._docs, t, side="left"))
        if self._i >= len(self._docs):  # defensive; block_last guarantees not
            self._load_block(self._b + 1)

    # -- block-max API (BMW / BMM) ------------------------------------------
    # The wand-data block pointer ``_wb`` is independent of the posting
    # position, exactly like the reference's BlockMaxScoredCursor
    # (cursor/block_max_scored_cursor.hpp:12-84): shallow moves never decode.

    def block_max_docid(self) -> int:
        if self._exhausted or self._wb >= len(self._wand_last):
            return self.end_sentinel
        return int(self._wand_last[self._wb])

    def block_max_score(self) -> float:
        if self._exhausted or self._wb >= len(self._wand_last):
            return 0.0
        return float(self._wand_max[self._wb]) * self.q_weight

    def block_max_next_geq(self, target: int) -> None:
        """Shallow advance: move only the wand-data block pointer to the
        block whose docid range covers ``target`` (no posting decode)."""
        if self._exhausted:
            return
        if self._wb < len(self._wand_last) and self._wand_last[self._wb] >= np.uint64(target):
            return
        self._wb = int(np.searchsorted(self._wand_last, np.uint64(target),
                                       side="left"))

    def exhausted(self) -> bool:
        return self._exhausted


def make_cursors(index, term_ids: List[int], scorer,
                 weights: Optional[List[float]] = None) -> List[Cursor]:
    """Build cursors for present terms (mirrors ``make_cursors``,
    ``/root/reference/include/pisa/cursor/scored_cursor.hpp:58-73``)."""
    sentinel = index.stats.num_docs
    out: List[Cursor] = []
    for j, tid in enumerate(term_ids):
        if tid is None:
            continue
        pl = index.posting_list(tid)
        if pl is None:
            continue
        ts = scorer.term_scorer(index.term_df(tid), index.term_occ(tid), index.stats)
        w = weights[j] if weights is not None else 1.0
        out.append(Cursor(pl, ts, sentinel, q_weight=w))
    return out
