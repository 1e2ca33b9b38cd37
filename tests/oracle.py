"""Pure-Python brute-force oracle: analyzer → postings → BM25 → exhaustive
top-k.  Independent of the Ray engine (no shared index/scoring code paths
except the analyzer, which is itself unit-tested against hand specs).
Mirrors the reference semantics: sorted-term lexicon ids, docid-ascending
postings, float32 BM25 (bm25.hpp:24-47), strict-threshold top-k with
zero-score trim (topk_queue.hpp:46-83)."""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from pisa_ray.analysis.analyzer import AnalyzerConfig, TextAnalyzer


class OracleIndex:
    def __init__(self, texts: Sequence[str],
                 config: Optional[AnalyzerConfig] = None,
                 doc_ids: Optional[Sequence[int]] = None):
        config = config or AnalyzerConfig()
        az = TextAnalyzer(config)
        self.analyzer = az
        self.doc_ids = list(doc_ids) if doc_ids is not None else list(range(len(texts)))
        self.doc_tokens = [az.analyze(t or "") for t in texts]
        self.doc_lens = {d: len(toks) for d, toks in zip(self.doc_ids, self.doc_tokens)}
        self.num_docs = len(texts)
        self.collection_len = sum(self.doc_lens.values())
        self.avg_len = self.collection_len / self.num_docs if self.num_docs else 0.0

        self.lexicon: List[str] = sorted({t for toks in self.doc_tokens for t in toks})
        self.term_to_id = {t: i for i, t in enumerate(self.lexicon)}
        # postings[tid] = [(doc_id, tf)] ascending doc_id
        self.postings: Dict[int, List[Tuple[int, int]]] = {
            i: [] for i in range(len(self.lexicon))}
        for d, toks in sorted(zip(self.doc_ids, self.doc_tokens)):
            for t, tf in sorted(Counter(toks).items()):
                self.postings[self.term_to_id[t]].append((d, tf))
        self.df = {i: len(p) for i, p in self.postings.items()}
        self.occ = {i: sum(tf for _, tf in p) for i, p in self.postings.items()}

    # -- float32 BM25, reference arithmetic ---------------------------------
    def bm25_weight(self, tf: int, doc_id: int, df: int,
                    k1: float = 0.9, b: float = 0.4) -> np.float32:
        f32 = np.float32
        idf = np.log((f32(self.num_docs) - f32(df) + f32(0.5)) / (f32(df) + f32(0.5)))
        w = max(f32(1e-6), idf) * (f32(1.0) + f32(k1))
        norm_len = f32(self.doc_lens[doc_id]) / f32(self.avg_len)
        tff = f32(tf)
        return f32(w * (tff / (tff + f32(k1) * (f32(1.0) - f32(b) + f32(b) * norm_len))))

    def topk(self, query: str, k: int = 10) -> List[Tuple[float, int]]:
        """Exhaustive ranked_or: term contributions summed in ascending
        term_id order, float32; strict >0 filter; ties docid asc."""
        toks = self.analyzer.analyze(query)
        tids = sorted({self.term_to_id[t] for t in toks if t in self.term_to_id})
        acc: Dict[int, np.float32] = {}
        for tid in tids:
            for d, tf in self.postings[tid]:
                w = self.bm25_weight(tf, d, self.df[tid])
                acc[d] = np.float32(acc.get(d, np.float32(0.0)) + w)
        items = [(float(s), d) for d, s in acc.items() if s > 0.0]
        items.sort(key=lambda e: (-e[0], e[1]))
        return items[:k]

    def threshold(self, query: str, k: int = 10) -> float:
        top = self.topk(query, k)
        return top[k - 1][0] if len(top) >= k else 0.0

    def bool_and(self, query: str) -> int:
        # unknown terms are dropped (reference TermProcessor semantics);
        # the conjunction runs over the remaining terms
        toks = self.analyzer.analyze(query)
        tids = {self.term_to_id[t] for t in toks if t in self.term_to_id}
        if not tids:
            return 0
        sets = [set(d for d, _ in self.postings[t]) for t in tids]
        return len(set.intersection(*sets))

    def bool_or(self, query: str) -> int:
        toks = self.analyzer.analyze(query)
        tids = {self.term_to_id[t] for t in toks if t in self.term_to_id}
        if not tids:
            return 0
        return len(set.union(*[set(d for d, _ in self.postings[t]) for t in tids]))


def make_corpus(n_docs: int = 80, seed: int = 7) -> List[str]:
    """Deterministic Zipf corpus with a stopword-grade hot term (~90% of
    docs), abbreviations, possessives and mixed alphanumerics."""
    rng = np.random.default_rng(seed)
    vocab = [f"term{i:03d}" for i in range(60)]
    probs = 1.0 / np.arange(1, len(vocab) + 1)
    probs /= probs.sum()
    docs = []
    for i in range(n_docs):
        length = int(rng.integers(5, 60))
        words = list(rng.choice(vocab, size=length, p=probs))
        if rng.random() < 0.9:
            words.insert(int(rng.integers(0, len(words) + 1)), "thehot")
        if i % 7 == 0:
            words.append("U.S.A.")
        if i % 5 == 0:
            words.append("dog's")
        if i % 11 == 0:
            words.append("x42y")
        docs.append(" ".join(words))
    docs.append("")  # empty doc keeps num_docs vs postings honest
    return docs
