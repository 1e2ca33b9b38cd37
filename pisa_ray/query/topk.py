"""Top-k queue with the reference's threshold semantics.

Mirrors ``/root/reference/include/pisa/topk_queue.hpp:19-139``:

* min-heap of (score, docid) capped at k;
* an entry enters only if ``score > effective_threshold`` (strictly);
* the effective threshold starts at ``nextafter(initial, 0)`` so a score
  equal to a forced initial threshold still enters, and becomes the k-th
  best score once the heap fills;
* ``finalize()`` sorts descending and trims trailing zero scores.

Divergence (documented): equal-score ties are ordered by ascending docid —
deterministic — where the reference leaves heap order unspecified.

Tie-eviction invariant: heap entries are stored as ``(score, -docid)`` so
that among equal k-th scores the *largest* docid is the heap minimum and is
evicted first.  This makes every heap-based algorithm implement exactly
(score desc, docid asc), matching the lexsort preselection used by
``ranked_or_taat`` / ``taat_maxscore`` — without the negation, a full heap
with tied k-th scores would evict the smallest docid and the DAAT and TAAT
families would return different top-k sets.
"""

from __future__ import annotations

import heapq
from typing import List, Tuple

import numpy as np


class TopKQueue:
    __slots__ = ("k", "initial_threshold", "effective_threshold", "_heap", "_final")

    def __init__(self, k: int, initial_threshold: float = 0.0):
        self.k = k
        self.initial_threshold = float(initial_threshold)
        self.effective_threshold = float(
            np.nextafter(np.float32(initial_threshold), np.float32(0.0)))
        self._heap: List[Tuple[float, int]] = []
        self._final = None

    def would_enter(self, score: float) -> bool:
        return score > self.effective_threshold

    def insert(self, score: float, docid: int = 0) -> bool:
        if not (score > self.effective_threshold):
            return False
        if len(self._heap) < self.k:
            heapq.heappush(self._heap, (score, -docid))
            if len(self._heap) == self.k:
                self.effective_threshold = self._heap[0][0]
        else:
            heapq.heapreplace(self._heap, (score, -docid))
            self.effective_threshold = self._heap[0][0]
        return True

    @property
    def threshold(self) -> float:
        return self.effective_threshold

    def true_threshold(self) -> float:
        """k-th best score, or 0.0 if not full (thresholds tool protocol,
        ``/root/reference/tools/thresholds.cpp:42-54``)."""
        return self._heap[0][0] if len(self._heap) == self.k else 0.0

    def finalize(self) -> List[Tuple[float, int]]:
        entries = [(s, -nd) for s, nd in self._heap]
        entries.sort(key=lambda e: (-e[0], e[1]))
        while entries and entries[-1][0] <= 0.0:
            entries.pop()
        self._final = entries
        return entries

    def topk(self) -> List[Tuple[float, int]]:
        return self._final if self._final is not None else self.finalize()

    def __len__(self) -> int:
        return len(self._heap)
