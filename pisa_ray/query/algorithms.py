"""Retrieval algorithms: exhaustive + dynamic-pruning top-k kernels.

Re-implementations (from the published algorithms, over our cursor API) of
the reference's query kernels (``/root/reference/include/pisa/query/
algorithm/*.hpp``; dispatch table ``tools/queries.cpp:175-288``):

* ``ranked_or``       — exhaustive DAAT union (the correctness oracle)
* ``ranked_or_taat``  — TAAT with a dense accumulator, numpy-vectorized
                        (the batch/throughput path; identical float32 sums)
* ``ranked_and``      — DAAT conjunction
* ``wand``            — WAND pivoting on per-term max scores (CIKM'03)
* ``block_max_wand``  — BMW: per-block max checks + shallow advances (SIGIR'11)
* ``maxscore``        — essential/non-essential split (Turtle & Flood '95)
* ``and_query`` / ``or_query`` — boolean intersection / union (doc counts)

All pruning algorithms must return the same top-k as ``ranked_or``; the
test suite enforces rank-identity (the reference's own equivalence-test
strategy, ``test/test_ranked_queries.cpp:18-146``).

These are *serving-side kernels*: parallelism comes from fanning queries
across an actor pool and the index across shards (SURVEY §2.9), not from
Ray tasks inside a query.
"""

from __future__ import annotations

from typing import List

import numpy as np

from pisa_ray.query.cursors import Cursor
from pisa_ray.query.topk import TopKQueue


# ---------------------------------------------------------------------------
# exhaustive

def ranked_or(cursors: List[Cursor], doc_lens: np.ndarray, k: int,
              initial_threshold: float = 0.0) -> TopKQueue:
    q = TopKQueue(k, initial_threshold)
    if not cursors:
        return q
    sentinel = cursors[0].end_sentinel
    cur = min(c.docid() for c in cursors)
    while cur < sentinel:
        score = 0.0
        nxt = sentinel
        for c in cursors:
            if c.docid() == cur:
                score += c.score(doc_lens)
                c.next()
            d = c.docid()
            if d < nxt:
                nxt = d
        q.insert(score, cur)
        cur = nxt
    return q


def ranked_or_taat(cursors: List[Cursor], doc_lens: np.ndarray, k: int,
                   initial_threshold: float = 0.0) -> TopKQueue:
    """TAAT: decode each list fully, accumulate into a dense score array
    (``Simple_Accumulator`` analogue, ``include/pisa/accumulator/
    simple_accumulator.hpp``), then top-k by argpartition.  Sums per doc
    happen in the same cursor order as ranked_or → identical float32."""
    q = TopKQueue(k, initial_threshold)
    if not cursors:
        return q
    n = len(doc_lens)
    acc = np.zeros(n, dtype=np.float32)
    touched = np.zeros(n, dtype=bool)
    for c in cursors:
        docs, freqs = c.pl.decode()
        idx = docs.astype(np.int64)
        scores = (c.scorer(freqs, doc_lens[idx]) * c.q_weight).astype(np.float32)
        acc[idx] += scores
        touched[idx] = True
    cand = np.flatnonzero(touched)
    if len(cand) == 0:
        return q
    scores = acc[cand]
    # deterministic (score desc, docid asc) order — argpartition alone would
    # break boundary score-ties arbitrarily
    order = np.lexsort((cand, -scores.astype(np.float64)))[: max(k, 0)]
    for i in order:
        q.insert(float(scores[i]), int(cand[i]))
    return q


def ranked_and(cursors: List[Cursor], doc_lens: np.ndarray, k: int,
               initial_threshold: float = 0.0) -> TopKQueue:
    q = TopKQueue(k, initial_threshold)
    if not cursors:
        return q
    cs = sorted(cursors, key=lambda c: c.pl.df)  # rarest first
    sentinel = cs[0].end_sentinel
    candidate = cs[0].docid()
    while candidate < sentinel:
        i = 1
        while i < len(cs):
            cs[i].next_geq(candidate)
            if cs[i].docid() != candidate:
                candidate = cs[i].docid()
                i = 0
                if candidate >= sentinel:
                    break
                cs[0].next_geq(candidate)
                if cs[0].docid() != candidate:
                    candidate = cs[0].docid()
                    continue
                i = 1
            else:
                i += 1
        if candidate >= sentinel:
            break
        score = sum(c.score(doc_lens) for c in cs)
        q.insert(score, candidate)
        cs[0].next()
        candidate = cs[0].docid()
    return q


# ---------------------------------------------------------------------------
# boolean

def and_count(cursors: List[Cursor]) -> int:
    if not cursors:
        return 0
    cs = sorted(cursors, key=lambda c: c.pl.df)
    sentinel = cs[0].end_sentinel
    count = 0
    candidate = cs[0].docid()
    while candidate < sentinel:
        ok = True
        for c in cs[1:]:
            c.next_geq(candidate)
            if c.docid() != candidate:
                ok = False
                candidate = max(candidate + 1, c.docid())
                cs[0].next_geq(candidate)
                candidate = cs[0].docid()
                break
        if ok:
            count += 1
            cs[0].next()
            candidate = cs[0].docid()
    return count


def or_count(cursors: List[Cursor]) -> int:
    if not cursors:
        return 0
    sentinel = cursors[0].end_sentinel
    count = 0
    cur = min(c.docid() for c in cursors)
    while cur < sentinel:
        count += 1
        nxt = sentinel
        for c in cursors:
            if c.docid() == cur:
                c.next()
            d = c.docid()
            if d < nxt:
                nxt = d
        cur = nxt
    return count


# ---------------------------------------------------------------------------
# WAND family

def wand(cursors: List[Cursor], doc_lens: np.ndarray, k: int,
         initial_threshold: float = 0.0) -> TopKQueue:
    q = TopKQueue(k, initial_threshold)
    if not cursors:
        return q
    sentinel = cursors[0].end_sentinel
    ordered = list(cursors)
    while True:
        ordered.sort(key=lambda c: c.docid())
        # find pivot: first cursor where the running max-score bound
        # exceeds the threshold
        bound = 0.0
        pivot = None
        for i, c in enumerate(ordered):
            if c.docid() >= sentinel:
                break
            bound += c.max_score
            if q.would_enter(bound):
                pivot = i
                break
        if pivot is None:
            break
        pivot_doc = ordered[pivot].docid()
        if pivot_doc >= sentinel:
            break
        if ordered[0].docid() == pivot_doc:
            score = 0.0
            for c in ordered:
                if c.docid() != pivot_doc:
                    break
                score += c.score(doc_lens)
                c.next()
            q.insert(score, pivot_doc)
        else:
            # advance the cursor with the largest max_score among those
            # strictly before pivot_doc (cursors at pivot_doc must stay put)
            adv = max((i for i in range(pivot)
                       if ordered[i].docid() < pivot_doc),
                      key=lambda i: ordered[i].max_score)
            ordered[adv].next_geq(pivot_doc)
    return q


def block_max_wand(cursors: List[Cursor], doc_lens: np.ndarray, k: int,
                   initial_threshold: float = 0.0) -> TopKQueue:
    q = TopKQueue(k, initial_threshold)
    if not cursors:
        return q
    sentinel = cursors[0].end_sentinel
    ordered = list(cursors)
    while True:
        ordered.sort(key=lambda c: c.docid())
        bound = 0.0
        pivot = None
        for i, c in enumerate(ordered):
            if c.docid() >= sentinel:
                break
            bound += c.max_score
            if q.would_enter(bound):
                pivot = i
                break
        if pivot is None:
            break
        pivot_doc = ordered[pivot].docid()
        if pivot_doc >= sentinel:
            break
        # extend the pivot over every cursor already sitting at pivot_doc —
        # their contributions belong to the candidate, and the block bound
        # below must include them (dropping this loses real top-k docs when
        # a low-bound cursor is the first at pivot_doc)
        while (pivot + 1 < len(ordered)
               and ordered[pivot + 1].docid() == pivot_doc):
            pivot += 1
        # block-max refinement: align block pointers to pivot_doc and check
        # the per-block bound
        block_bound = 0.0
        for c in ordered[: pivot + 1]:
            c.block_max_next_geq(pivot_doc)
            block_bound += c.block_max_score()
        if q.would_enter(block_bound):
            if ordered[0].docid() == pivot_doc:
                score = 0.0
                for c in ordered:
                    if c.docid() != pivot_doc:
                        break
                    score += c.score(doc_lens)
                    c.next()
                q.insert(score, pivot_doc)
            else:
                adv = max((i for i in range(pivot)
                           if ordered[i].docid() < pivot_doc),
                          key=lambda i: ordered[i].max_score)
                ordered[adv].next_geq(pivot_doc)
        else:
            # the current blocks can't beat the threshold: jump past the
            # smallest block boundary among the lead cursors
            next_doc = min(c.block_max_docid() for c in ordered[: pivot + 1])
            next_doc += 1
            if pivot + 1 < len(ordered):
                next_doc = min(next_doc, ordered[pivot + 1].docid())
            if next_doc >= sentinel:
                # all lead cursors exhausted their blocks past sentinel
                for c in ordered[: pivot + 1]:
                    c.next_geq(sentinel)
                continue
            candidates = [i for i in range(pivot + 1)
                          if ordered[i].docid() < next_doc]
            if candidates:
                adv = max(candidates, key=lambda i: ordered[i].max_score)
                ordered[adv].next_geq(next_doc)
            else:
                # every lead cursor already sits at/past next_doc; force
                # progress on the leftmost one
                ordered[0].next()
    return q


def maxscore(cursors: List[Cursor], doc_lens: np.ndarray, k: int,
             initial_threshold: float = 0.0) -> TopKQueue:
    q = TopKQueue(k, initial_threshold)
    if not cursors:
        return q
    sentinel = cursors[0].end_sentinel
    # sort by max_score descending; suffix sums = upper bounds of tails
    cs = sorted(cursors, key=lambda c: c.max_score, reverse=True)
    m = len(cs)
    upper = np.zeros(m + 1, dtype=np.float64)
    for i in range(m - 1, -1, -1):
        upper[i] = upper[i + 1] + cs[i].max_score
    first_ne = m  # start of non-essential tail
    cur = min(c.docid() for c in cs)
    while cur < sentinel:
        # update essential/non-essential split as threshold grows
        while first_ne > 0 and upper[first_ne - 1] <= q.threshold:
            first_ne -= 1
        if first_ne == 0:
            break
        essential = cs[:first_ne]
        score = 0.0
        nxt = sentinel
        for c in essential:
            if c.docid() == cur:
                score += c.score(doc_lens)
                c.next()
            d = c.docid()
            if d < nxt:
                nxt = d
        # non-essential lists: add with upper-bound early exit
        for i in range(first_ne, m):
            if not q.would_enter(score + upper[i]):
                break
            cs[i].next_geq(cur)
            if cs[i].docid() == cur:
                score += cs[i].score(doc_lens)
        q.insert(score, cur)
        cur = nxt
    return q


ALGORITHMS = {
    "ranked_or": ranked_or,
    "ranked_or_taat": ranked_or_taat,
    "ranked_and": ranked_and,
    "wand": wand,
    "block_max_wand": block_max_wand,
    "maxscore": maxscore,
}


def block_max_maxscore(cursors: List[Cursor], doc_lens: np.ndarray, k: int,
                       initial_threshold: float = 0.0) -> TopKQueue:
    """MaxScore with per-block bounds on the non-essential lists
    (block_max_maxscore_query.hpp capability): before probing a
    non-essential list, its contribution is bounded by the current block
    max; if even that bound cannot reach the threshold, the document is
    abandoned (the tail bound already includes every later list)."""
    q = TopKQueue(k, initial_threshold)
    if not cursors:
        return q
    sentinel = cursors[0].end_sentinel
    cs = sorted(cursors, key=lambda c: c.max_score, reverse=True)
    m = len(cs)
    upper = np.zeros(m + 1, dtype=np.float64)
    for i in range(m - 1, -1, -1):
        upper[i] = upper[i + 1] + cs[i].max_score
    first_ne = m
    cur = min(c.docid() for c in cs)
    while cur < sentinel:
        while first_ne > 0 and upper[first_ne - 1] <= q.threshold:
            first_ne -= 1
        if first_ne == 0:
            break
        essential = cs[:first_ne]
        score = 0.0
        nxt = sentinel
        for c in essential:
            if c.docid() == cur:
                score += c.score(doc_lens)
                c.next()
            d = c.docid()
            if d < nxt:
                nxt = d
        for i in range(first_ne, m):
            if not q.would_enter(score + upper[i]):
                break
            cs[i].block_max_next_geq(cur)
            if not q.would_enter(score + cs[i].block_max_score()
                                 + upper[i + 1]):
                # even the block-max bound can't lift this doc over the
                # threshold together with the full tail bound → abandon
                score = -1.0  # sentinel: skip insert
                break
            cs[i].next_geq(cur)
            if cs[i].docid() == cur:
                score += cs[i].score(doc_lens)
        if score >= 0.0:
            q.insert(score, cur)
        cur = nxt
    return q


def block_max_ranked_and(cursors: List[Cursor], doc_lens: np.ndarray, k: int,
                         initial_threshold: float = 0.0) -> TopKQueue:
    """Conjunction with block-max early exit
    (block_max_ranked_and_query.hpp capability): a candidate docid is
    scored only if the sum of the current block maxes beats the
    threshold."""
    q = TopKQueue(k, initial_threshold)
    if not cursors:
        return q
    cs = sorted(cursors, key=lambda c: c.pl.df)
    sentinel = cs[0].end_sentinel
    candidate = cs[0].docid()
    while candidate < sentinel:
        i = 1
        while i < len(cs):
            cs[i].next_geq(candidate)
            if cs[i].docid() != candidate:
                candidate = cs[i].docid()
                i = 0
                if candidate >= sentinel:
                    break
                cs[0].next_geq(candidate)
                if cs[0].docid() != candidate:
                    candidate = cs[0].docid()
                    continue
                i = 1
            else:
                i += 1
        if candidate >= sentinel:
            break
        block_bound = 0.0
        for c in cs:
            c.block_max_next_geq(candidate)
            block_bound += c.block_max_score()
        if q.would_enter(block_bound):
            score = sum(c.score(doc_lens) for c in cs)
            q.insert(score, candidate)
        cs[0].next()
        candidate = cs[0].docid()
    return q


class _RangeBoundCursor:
    """View of a cursor clipped to docids < ``bound`` (for range queries /
    doc-sharded serving).  The underlying cursor persists across ranges —
    ranges must be visited in ascending order."""

    __slots__ = ("c", "bound")

    def __init__(self, c: Cursor, bound: int):
        self.c = c
        self.bound = bound

    @property
    def pl(self):
        return self.c.pl

    @property
    def max_score(self):
        return self.c.max_score

    @property
    def end_sentinel(self):
        return self.bound

    @property
    def q_weight(self):
        return self.c.q_weight

    @property
    def scorer(self):
        return self.c.scorer

    def docid(self):
        d = self.c.docid()
        return d if d < self.bound else self.bound

    def freq(self):
        return self.c.freq()

    def score(self, doc_lens):
        return self.c.score(doc_lens)

    def next(self):
        self.c.next()

    def next_geq(self, target):
        self.c.next_geq(min(target, self.bound))

    def block_max_docid(self):
        return min(self.c.block_max_docid(), self.bound)

    def block_max_score(self):
        return self.c.block_max_score()

    def block_max_next_geq(self, target):
        self.c.block_max_next_geq(min(target, self.bound))

    def exhausted(self):
        return self.c.exhausted() or self.c.docid() >= self.bound


def range_query(algorithm: str, cursors: List[Cursor], doc_lens: np.ndarray,
                k: int, *, range_size: int = 1 << 14,
                initial_threshold: float = 0.0) -> TopKQueue:
    """Run ``algorithm`` over consecutive docid ranges, sharing one top-k
    queue whose growing threshold prunes later ranges (range_query.hpp:8-39).
    Rank-identical to the one-shot run."""
    if not cursors:
        return TopKQueue(k, initial_threshold)
    sentinel = cursors[0].end_sentinel
    algo = ALGORITHMS[algorithm]
    q = TopKQueue(k, initial_threshold)
    for lo in range(0, sentinel, range_size):
        hi = min(lo + range_size, sentinel)
        bounded = [_RangeBoundCursor(c, hi) for c in cursors
                   if not c.exhausted()]
        if not bounded:
            break
        sub = algo(bounded, doc_lens, k, q.effective_threshold
                   if hasattr(q, "effective_threshold") else 0.0)
        for score, doc in sub.topk():
            q.insert(score, doc)
        for b in bounded:
            b.next_geq(hi)
    return q


ALGORITHMS["block_max_maxscore"] = block_max_maxscore
ALGORITHMS["block_max_ranked_and"] = block_max_ranked_and


def taat_maxscore_arrays(lists, n: int, k: int,
                         initial_threshold: float = 0.0,
                         workspace=None) -> TopKQueue:
    """Vectorized TAAT with MaxScore pruning over PRE-SCORED arrays.

    ``lists`` is ``[(docs:int64[], scores:float32[], max_score, weight)]``.
    This is the kernel behind ``taat_maxscore``; serving actors feed it
    decoded-and-scored posting arrays from a per-actor cache
    (``QueryEngine.scored_postings``) so the per-query cost is pure
    numpy scatter-adds — no decode, no per-posting Python.

    ``workspace`` = reusable ``(acc: float32[n], touched: bool[n])``
    zeroed arrays; the kernel re-zeroes exactly the entries it touched
    before returning (the reference's Lazy_Accumulator trade, avoiding an
    O(n) allocation + clear per query)."""
    q = TopKQueue(k, initial_threshold)
    lists = [x for x in lists if x is not None and len(x[0])]
    if not lists:
        return q
    ls = sorted(lists, key=lambda x: x[2] * x[3], reverse=True)
    m = len(ls)
    upper = np.zeros(m + 1, dtype=np.float64)
    for i in range(m - 1, -1, -1):
        upper[i] = upper[i + 1] + ls[i][2] * ls[i][3]

    if workspace is not None:
        acc, touched = workspace
    else:
        acc = np.zeros(n, dtype=np.float32)
        touched = np.zeros(n, dtype=bool)
    threshold = float(np.nextafter(np.float32(initial_threshold),
                                   np.float32(0.0)))

    def current_threshold() -> float:
        cand = np.flatnonzero(touched)
        if len(cand) < k:
            return threshold
        sc = acc[cand]
        kth = np.partition(sc, len(sc) - k)[len(sc) - k]
        return max(threshold, float(kth))

    i = 0
    while i < m:
        if touched.any() and upper[i] <= current_threshold():
            break  # remaining lists can't create new top-k entrants alone…
        docs, scores, _mx, w = ls[i]
        add = scores if w == 1.0 else (scores * np.float32(w))
        acc[docs] += add
        touched[docs] = True
        i += 1

    if i < m:
        # …but existing candidates may still be lifted: only docs whose
        # accumulated score + remaining bound beats the threshold matter
        thr = current_threshold()
        cand = np.flatnonzero(touched)
        cand = cand[acc[cand] + upper[i] > thr]
        for j in range(i, m):
            if len(cand) == 0 or not upper[j] > 0:
                break
            docs, scores, _mx, w = ls[j]
            pos = np.searchsorted(docs, cand)
            pos = np.clip(pos, 0, len(docs) - 1)
            hit = docs[pos] == cand
            if hit.any():
                hp = pos[hit]
                hd = cand[hit]
                add = scores[hp] if w == 1.0 else (scores[hp]
                                                   * np.float32(w))
                acc[hd] += add
            # tighten the candidate set with the next remaining bound
            thr = current_threshold()
            cand = cand[acc[cand] + upper[j + 1] > thr]

    candidates = np.flatnonzero(touched)
    if len(candidates) == 0:
        return q
    scores = acc[candidates]
    if workspace is not None:
        # leave the workspace zeroed for the next query
        acc[candidates] = 0.0
        touched[candidates] = False
    order = np.lexsort((candidates, -scores.astype(np.float64)))[:k]
    for o in order:
        q.insert(float(scores[o]), int(candidates[o]))
    return q


def taat_maxscore(cursors: List[Cursor], doc_lens: np.ndarray, k: int,
                  initial_threshold: float = 0.0) -> TopKQueue:
    """Vectorized TAAT with MaxScore pruning — the large-corpus serving
    path.  Decodes + scores each cursor's full list once, then runs the
    array kernel.  Sound for the same reason as maxscore: bounds are upper
    bounds.  Rank-identical to ranked_or."""
    lists = []
    for c in cursors:
        docs, freqs = c.pl.decode()
        idx = docs.astype(np.int64)
        scores = c.scorer(freqs, doc_lens[idx]).astype(np.float32)
        lists.append((idx, scores, float(c.pl.max_score),
                      float(c.q_weight)))
    return taat_maxscore_arrays(lists, len(doc_lens), k, initial_threshold)


ALGORITHMS["taat_maxscore"] = taat_maxscore


# ---------------------------------------------------------------------------
# block-max TAAT: vectorized range-partitioned pruning (the round-3 scale
# kernel — block-max skipping for the numpy serving path)

RANGE_BITS = 14  # docids per range = 16384; ranges at 3M docs ≈ 190


def range_meta(docs: np.ndarray, scores: np.ndarray,
               range_bits: int = RANGE_BITS):
    """(rids, starts, rmax): the list's non-empty docid ranges, the offset
    of each range's first posting, and the EXACT max score within each
    range (tighter than codec-block maxes, one ``reduceat`` at cache
    time)."""
    rid = (docs >> np.int64(range_bits)).astype(np.int64)
    starts = np.flatnonzero(np.diff(rid)) + 1
    starts = np.concatenate(([0], starts))
    rids = rid[starts]
    rmax = np.maximum.reduceat(scores, starts)
    return rids, starts, rmax


def block_max_taat_arrays(lists, n: int, k: int,
                          initial_threshold: float = 0.0,
                          range_bits: int = RANGE_BITS,
                          metas=None, workspace=None) -> TopKQueue:
    """Exact top-k via range-partitioned scatter-adds with block-max
    pruning, fully vectorized.

    The docid space is cut into ``2**range_bits``-doc ranges; every
    posting of a doc lives in the doc's range, so scoring one range
    completely finalizes its docs.  Per range, an upper bound
    ``U[r] = Σ_lists w·max(score in r)`` is computed from per-list EXACT
    range maxima (``range_meta``, precomputed once per cached list).
    Ranges are processed in DESCENDING U order — the threshold rises
    fastest first, and the scan stops at the first range whose bound
    cannot beat the running k-th score, which wholesale-skips every
    remaining range (same guarantee as BMW's block-skip, SIGIR'11, at
    range granularity; processing order is score-at-a-time in the
    JASS/impact-ordered tradition).

    Tie handling matches the heap convention (``topk.py``): candidates
    equal to the k-th score are kept until the final
    (score desc, docid asc) selection, and a range is skipped only when
    its bound is strictly below the k-th score.

    ``lists`` = [(docs:int64[], scores:float32[], max_score, weight)];
    ``metas`` optionally supplies each list's ``range_meta`` (else
    computed here).  ``workspace``: reusable float32 accumulator of
    length ``2**range_bits``."""
    q = TopKQueue(k, initial_threshold)
    keep = [(x, i) for i, x in enumerate(lists)
            if x is not None and len(x[0])]
    if not keep:
        return q
    rsize = 1 << range_bits
    nr = (n + rsize - 1) >> range_bits
    metas = [(metas[i] if metas is not None and metas[i] is not None
              else range_meta(x[0], x[1], range_bits))
             for x, i in keep]
    upper = np.zeros(nr, dtype=np.float64)
    for (x, _i), (rids, _starts, rmax) in zip(keep, metas):
        # rids are strictly increasing (sorted docs) → plain fancy add
        upper[rids] += rmax.astype(np.float64) * x[3]
    order = np.argsort(-upper, kind="stable")

    # strict entry threshold: scores must EXCEED it, so == threshold is
    # kept.  Lower the f32 threshold by (num_lists + 1) ulps: one ulp for
    # the strictness itself (toward −inf — nextafter toward 0 moves the
    # wrong way for negative thresholds), the rest as slack for f32
    # sequential-accumulation rounding — a doc whose served f32 sum
    # rounds up by ≤ L ulps must not be range-skipped by the f64 bound
    # (rank-identity contract; extra pool candidates are harmless, the
    # final selection re-sorts true scores)
    def _lower(t: float) -> float:
        x = np.float32(t)
        for _ in range(len(keep) + 1):
            x = np.nextafter(x, np.float32(-np.inf))
        return float(x)

    # exactly 0.0 stays 0.0: no real score ties zero, and a negative
    # epsilon would admit every untouched (exactly-0) accumulator cell
    # in the dense candidate scan
    thr_strict = 0.0 if initial_threshold == 0.0 \
        else _lower(initial_threshold)
    local = workspace if workspace is not None and len(workspace) >= rsize \
        else np.zeros(rsize, dtype=np.float32)
    pool_d: List[np.ndarray] = []
    pool_s: List[np.ndarray] = []
    pool_n = 0
    for r in order:
        if upper[r] <= thr_strict:
            break
        base = int(r) << range_bits
        touched_idx = []
        for (x, _i), (rids, starts, _rmax) in zip(keep, metas):
            j = np.searchsorted(rids, r)
            if j >= len(rids) or rids[j] != r:
                continue
            lo = starts[j]
            hi = starts[j + 1] if j + 1 < len(starts) else len(x[0])
            idx = x[0][lo:hi] - base
            add = x[1][lo:hi]
            if x[3] != 1.0:
                add = add * np.float32(x[3])
            local[idx] += add
            touched_idx.append(idx)
        if not touched_idx:
            continue
        if thr_strict >= 0.0:
            # dense candidate scan: untouched cells are exactly 0 ≤ thr,
            # so one vectorized compare over the range replaces the
            # sort-based np.unique over touched docids (the old hot spot —
            # 55% of query time on hot terms)
            cand = np.flatnonzero(local[:min(rsize, n - base)]
                                  > np.float32(thr_strict))
            if len(cand):
                pool_d.append(cand + base)
                pool_s.append(local[cand].copy())
                pool_n += len(cand)
        else:
            tix = np.concatenate(touched_idx) if len(touched_idx) > 1 \
                else touched_idx[0]
            cand = tix if len(touched_idx) == 1 else np.unique(tix)
            sc = local[cand]
            m = sc > np.float32(thr_strict)
            if m.any():
                pool_d.append(cand[m] + base)
                pool_s.append(sc[m].copy())
                pool_n += int(m.sum())
        for idx in touched_idx:
            local[idx] = 0.0
        if pool_n >= k:
            pd = np.concatenate(pool_d) if len(pool_d) > 1 else pool_d[0]
            ps = np.concatenate(pool_s) if len(pool_s) > 1 else pool_s[0]
            kth = float(np.partition(ps, len(ps) - k)[len(ps) - k])
            thr_strict = max(thr_strict, _lower(kth))
            keep_m = ps >= np.float32(kth)
            pool_d, pool_s = [pd[keep_m]], [ps[keep_m]]
            pool_n = int(keep_m.sum())
    if pool_n == 0:
        return q
    pd = np.concatenate(pool_d) if len(pool_d) > 1 else pool_d[0]
    ps = np.concatenate(pool_s) if len(pool_s) > 1 else pool_s[0]
    sel = np.lexsort((pd, -ps.astype(np.float64)))[:k]
    for o in sel:
        q.insert(float(ps[o]), int(pd[o]))
    return q


def block_max_taat(cursors: List[Cursor], doc_lens: np.ndarray, k: int,
                   initial_threshold: float = 0.0) -> TopKQueue:
    """Cursor-API wrapper over ``block_max_taat_arrays`` (decode + score
    each list once, like ``taat_maxscore``).  Rank-identical to
    ``ranked_or``."""
    lists = []
    for c in cursors:
        docs, freqs = c.pl.decode()
        idx = docs.astype(np.int64)
        scores = c.scorer(freqs, doc_lens[idx]).astype(np.float32)
        lists.append((idx, scores, float(c.pl.max_score),
                      float(c.q_weight)))
    return block_max_taat_arrays(lists, len(doc_lens), k, initial_threshold)


ALGORITHMS["block_max_taat"] = block_max_taat
