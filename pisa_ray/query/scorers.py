"""Ranking scorers: bm25, qld, pl2, dph, quantized.

Vectorized re-expressions of the reference formulas (numpy over posting
blocks instead of a per-posting closure):

* bm25  — ``/root/reference/include/pisa/scorer/bm25.hpp:24-47``
  (k1=0.9, b=0.4 defaults from ``scorer/scorer.hpp:18-19``)
* qld   — ``scorer/qld.hpp:19-40`` (mu=1000)
* pl2   — ``scorer/pl2.hpp`` (c=1)
* dph   — ``scorer/dph.hpp`` (parameter-free)
* quantized — identity over pre-quantized freqs (``scorer/quantized.hpp``)

``dtype=float32`` reproduces the reference's float arithmetic (epsilon idf
floor, ``(1+k1)`` factor); ``float64`` is used for the DuckDB-oracle paths
where both sides compute in doubles.

A term scorer is ``fn(tfs, doc_lens) -> scores`` built once per (term,
stats); stats are the global collection statistics the WAND data carries
(``/root/reference/include/pisa/wand_data.hpp:56-85``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable

import numpy as np

BM25_K1 = 0.9
BM25_B = 0.4
QLD_MU = 1000.0
PL2_C = 1.0

TermScorer = Callable[[np.ndarray, np.ndarray], np.ndarray]


@dataclass(frozen=True)
class CollectionStats:
    num_docs: int
    avg_len: float
    collection_len: int


class Scorer:
    """Base: builds a vectorized per-term scorer from term stats."""

    name = "?"

    def term_scorer(self, df: int, occ: int, stats: CollectionStats) -> TermScorer:
        raise NotImplementedError


class BM25(Scorer):
    name = "bm25"

    def __init__(self, k1: float = BM25_K1, b: float = BM25_B, dtype=np.float32):
        self.k1, self.b, self.dtype = k1, b, dtype

    def term_scorer(self, df: int, occ: int, stats: CollectionStats) -> TermScorer:
        dt = self.dtype
        k1, b = dt(self.k1), dt(self.b)
        # idf = max(1e-6, ln((N - df + 0.5)/(df + 0.5))) * (1 + k1)
        idf = np.log((dt(stats.num_docs) - dt(df) + dt(0.5)) / (dt(df) + dt(0.5)))
        w = np.maximum(dt(1e-6), idf) * (dt(1.0) + k1)
        avg = dt(stats.avg_len)

        def score(tfs: np.ndarray, doc_lens: np.ndarray) -> np.ndarray:
            f = tfs.astype(dt)
            norm_len = doc_lens.astype(dt) / avg
            return w * (f / (f + k1 * (dt(1.0) - b + b * norm_len)))

        return score


class QLD(Scorer):
    name = "qld"

    def __init__(self, mu: float = QLD_MU, dtype=np.float32):
        self.mu, self.dtype = mu, dtype

    def term_scorer(self, df: int, occ: int, stats: CollectionStats) -> TermScorer:
        dt = self.dtype
        mu = dt(self.mu)
        coll_freq = dt(occ) / dt(stats.collection_len)

        def score(tfs: np.ndarray, doc_lens: np.ndarray) -> np.ndarray:
            num = dt(1.0) + tfs.astype(dt) / (mu * coll_freq)
            den = mu / (doc_lens.astype(dt) + mu)
            return np.maximum(dt(0.0), np.log(num) + np.log(den))

        return score


class PL2(Scorer):
    name = "pl2"

    def __init__(self, c: float = PL2_C, dtype=np.float32):
        self.c, self.dtype = c, dtype

    def term_scorer(self, df: int, occ: int, stats: CollectionStats) -> TermScorer:
        dt = self.dtype
        c, avg = dt(self.c), dt(stats.avg_len)
        f = dt(occ) / dt(stats.num_docs)
        e = dt(math.log(0.5))

        def score(tfs: np.ndarray, doc_lens: np.ndarray) -> np.ndarray:
            tfn = tfs.astype(dt) * np.log2(dt(1.0) + (c * avg) / doc_lens.astype(dt))
            norm = dt(1.0) / (tfn + dt(1.0))
            return norm * (
                tfn * np.log2(dt(1.0) / f)
                + f * e
                + dt(0.5) * np.log2(dt(2.0 * math.pi) * tfn)
                + tfn * (np.log2(tfn) - e)
            )

        return score


class DPH(Scorer):
    name = "dph"

    def __init__(self, dtype=np.float32):
        self.dtype = dtype

    def term_scorer(self, df: int, occ: int, stats: CollectionStats) -> TermScorer:
        dt = self.dtype
        avg, n, occf = dt(stats.avg_len), dt(stats.num_docs), dt(occ)

        def score(tfs: np.ndarray, doc_lens: np.ndarray) -> np.ndarray:
            freq = tfs.astype(dt)
            dl = doc_lens.astype(dt)
            f = freq / dl
            norm = (dt(1.0) - f) * (dt(1.0) - f) / (freq + dt(1.0))
            return norm * (
                freq * np.log2((freq * avg / dl) * (n / occf))
                + dt(0.5) * np.log2(dt(2.0 * math.pi) * freq * (dt(1.0) - f))
            )

        return score


class Quantized(Scorer):
    name = "quantized"

    def term_scorer(self, df: int, occ: int, stats: CollectionStats) -> TermScorer:
        return lambda tfs, doc_lens: tfs.astype(np.float32)


def make_scorer(name: str, dtype=np.float32, **params) -> Scorer:
    """Factory mirroring ``scorer::from_params`` (scorer/scorer.hpp:24-47)."""
    if name == "bm25":
        return BM25(dtype=dtype, **params)
    if name == "qld":
        return QLD(dtype=dtype, **params)
    if name == "pl2":
        return PL2(dtype=dtype, **params)
    if name == "dph":
        return DPH(dtype=dtype, **params)
    if name == "quantized":
        return Quantized()
    raise ValueError(f"unknown scorer {name!r}")


def quantize_scores(scores: np.ndarray, max_score: float, bits: int = 8) -> np.ndarray:
    """LinearQuantizer: ceil(score * 2^bits / max)
    (``/root/reference/include/pisa/linear_quantizer.hpp:8-26``)."""
    if not 0 < bits <= 32:
        raise ValueError(f"bits must be in 1..32, got {bits}")
    scale = np.float32((1 << bits)) / np.float32(max_score)
    return np.ceil(scores.astype(np.float32) * scale).astype(np.uint32)
