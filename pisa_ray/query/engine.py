"""Query serving: term processing, per-query execution, Ray actor-pool fanout.

Mirrors the reference's serving shape: the whole index is loaded once per
process and queries run in parallel across it
(``/root/reference/tools/queries.cpp:118-295``,
``tools/evaluate_queries.cpp:142-147``).  Here each *actor* in a
``map_batches`` pool over the query Dataset holds one ``InvertedIndex``
(loaded in ``__init__``), and Ray schedules query batches across the pool —
queries fan out across actors, shards fan out across indexes (per-shard
top-k merged by score desc / docid asc, rank-identical because collection
stats are global).

Query-side term processing follows the reference TermProcessor
(``include/pisa/query/term_processor.hpp:19-63``): run the same analyzer
chain, look terms up in the sorted lexicon, drop unknowns, then either
dedup (sorted unique, ``src/query/queries.cpp:101-108``) or keep
multiplicities as weights (``query_freqs``, ``:110-120``).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

from pisa_ray.analysis.analyzer import AnalyzerConfig, TextAnalyzer
from pisa_ray.index.reader import InvertedIndex
from pisa_ray.query.algorithms import (ALGORITHMS, and_count,
                                        or_count, range_query)
from pisa_ray.query.cursors import make_cursors
from pisa_ray.query.scorers import make_scorer


class QueryEngine:
    def __init__(self, index_dir: str, *, scorer: Optional[str] = None,
                 score_dtype: Optional[str] = None,
                 analyzer: Optional[AnalyzerConfig] = None,
                 doc_range: Optional[Tuple[int, int]] = None):
        import os

        from pisa_ray.utils import ensure_malloc_tuned, in_ray_worker

        # serving ACTORS allocate per-query scratch → tune their arena;
        # driver-side engines (every tools.py estimator builds one) stay
        # untuned so drivers/tests don't retain up to ~256 MiB of arena
        # RSS (round-4 advice).  PISA_RAY_MALLOC_TUNE=1 forces tuning for
        # a driver that IS the serving process (single-process deploys).
        if in_ray_worker() or os.environ.get("PISA_RAY_MALLOC_TUNE"):
            ensure_malloc_tuned()
        self.index = InvertedIndex(index_dir, doc_range=doc_range)
        cfg = self.index.config
        # A quantized index stores precomputed impacts, not term frequencies;
        # scoring them with BM25 would be meaningless and inconsistent with
        # the stored WAND/block-max metadata — default to the quantized
        # scorer unless the caller explicitly overrides.
        if scorer is None and int(cfg.get("quantize_bits") or 0) > 0:
            scorer = "quantized"
        scorer_name = scorer or cfg.get("scorer", "bm25")
        dtype_name = score_dtype or cfg.get("score_dtype", "float32")
        dtype = np.float32 if dtype_name == "float32" else np.float64
        params = dict(cfg.get("scorer_params") or {})
        self.scorer = make_scorer(scorer_name, dtype=dtype, **params)
        self.analyzer = TextAnalyzer(analyzer or AnalyzerConfig(
            tokenizer=cfg.get("tokenizer", "english"),
            token_filters=tuple(cfg.get("token_filters", ("lowercase",))),
            stopwords=frozenset(cfg.get("stopwords", ())),
            # krovetz headword/exception files recorded at build time:
            # query-side term processing must conflate exactly like the
            # index did, or lexicon lookups miss (term_processor.hpp
            # loads the same stemmer both sides)
            kstem_lexicon=cfg.get("kstem_lexicon") or None,
            kstem_exceptions=cfg.get("kstem_exceptions") or None,
        ))
        # decoded+scored posting arrays, cached per term per actor — the
        # vectorized TAAT path then costs one numpy scatter-add per term
        # per query (the analogue of the reference keeping the mmap'd
        # index hot).  Capped in postings so a huge vocabulary can't blow
        # the actor heap; beyond the cap lists are decoded per query.
        self._scored_cache: Dict[int, tuple] = {}
        self._scored_cache_postings = 0
        self.scored_cache_max_postings = 100_000_000  # ~1.2 GB
        self._taat_ws = None  # reusable (acc, touched) accumulator pair
        self._bmt_ws = None   # reusable range-local accumulator
        self._range_meta = {}  # term_id -> range_meta (block_max_taat)

    def scored_postings(self, term_id: int):
        """(docs:int64[], scores:float32[], max_score) for one term, from
        the per-actor cache."""
        hit = self._scored_cache.get(term_id)
        if hit is not None:
            return hit
        pl = self.index.posting_list(term_id)
        if pl is None:
            return None
        docs, freqs = pl.decode()
        idx = docs.astype(np.int64)
        ts = self.scorer.term_scorer(
            self.index.term_df(term_id), self.index.term_occ(term_id),
            self.index.stats)
        scores = ts(freqs, self.index.doc_lens[idx]).astype(np.float32)
        entry = (idx, scores, float(pl.max_score))
        if (self._scored_cache_postings + len(idx)
                <= self.scored_cache_max_postings):
            self._scored_cache[term_id] = entry
            self._scored_cache_postings += len(idx)
        return entry

    # -- term processing ----------------------------------------------------
    def parse_query(self, text: str, weighted: bool = False
                    ) -> Tuple[List[int], Optional[List[float]]]:
        toks = self.analyzer.analyze(text)
        ids = [t for t in self.index.term_ids(toks) if t is not None]
        if weighted:
            freqs = Counter(ids)
            terms = sorted(freqs)
            return terms, [float(freqs[t]) for t in terms]
        return sorted(set(ids)), None

    # -- execution ----------------------------------------------------------
    def run(self, query: str, k: int = 10, algorithm: str = "ranked_or_taat",
            weighted: bool = False, initial_threshold: float = 0.0,
            range_size: Optional[int] = None) -> List[Tuple[float, int]]:
        """→ [(score, doc_id)] descending, ties by doc_id asc.

        ``range_size``: run the (DAAT) algorithm over consecutive docid
        ranges sharing one queue (``range_query<T>`` capability,
        range_query.hpp:8-39)."""
        if self.index.doc_range is not None:
            # a doc_range-restricted index clips doc_lens to the shard;
            # run() would score boundary-overlapping segments with wrong
            # lengths — only run_shard discards out-of-range docs
            raise ValueError(
                "QueryEngine was built with doc_range=%r; use run_shard()"
                % (self.index.doc_range,))
        term_ids, weights = self.parse_query(query, weighted)
        if algorithm in ("taat_maxscore", "block_max_taat") and not range_size:
            # serve from the per-actor scored-postings cache: per query
            # this is pure numpy scatter-adds, no decode
            from pisa_ray.query.algorithms import (
                RANGE_BITS, block_max_taat_arrays, range_meta,
                taat_maxscore_arrays)

            lists, terms_used = [], []
            for i, t in enumerate(term_ids):
                sp = self.scored_postings(t)
                if sp is not None:
                    w = weights[i] if weights else 1.0
                    lists.append((sp[0], sp[1], sp[2], float(w)))
                    terms_used.append(t)
            n = len(self.index.doc_lens)
            if algorithm == "block_max_taat":
                # adaptive range size: the per-range Python/numpy call
                # overhead (~30 µs) dominates SPARSE queries (few hundred
                # postings per 16k-doc range → 12+ ms at 6M docs), so
                # coarsen the partition until each range carries ≥ ~4k
                # postings.  Dense (hot-term) queries keep the fine
                # default — their per-range work amortizes the overhead
                # and fine ranges prune harder.  Exactness/rank-identity
                # hold at ANY granularity (the bound is per-partition).
                total = sum(len(x[0]) for x in lists)
                rb = RANGE_BITS
                nranges_cap = max(1, total // 4096)
                # rb cap bounds the reusable accumulator at 4M cells
                # (16 MB) no matter how sparse the query or big the corpus
                while (n >> rb) > nranges_cap and rb < 22:
                    rb += 1
                metas = []
                for (x, t) in zip(lists, terms_used):
                    rm = self._range_meta.get((t, rb))
                    if rm is None and t in self._scored_cache:
                        rm = range_meta(x[0], x[1], rb)
                        self._range_meta[(t, rb)] = rm
                    metas.append(rm)
                ws = self._bmt_ws
                if ws is None or len(ws) < (1 << rb):
                    ws = self._bmt_ws = np.zeros(1 << rb, dtype=np.float32)
                q = block_max_taat_arrays(lists, n, k, initial_threshold,
                                          range_bits=rb, metas=metas,
                                          workspace=ws)
                return q.finalize()
            if self._taat_ws is None or len(self._taat_ws[0]) != n:
                self._taat_ws = (np.zeros(n, dtype=np.float32),
                                 np.zeros(n, dtype=bool))
            q = taat_maxscore_arrays(lists, n, k, initial_threshold,
                                     workspace=self._taat_ws)
            return q.finalize()
        cursors = make_cursors(self.index, term_ids, self.scorer, weights)
        if range_size:
            q = range_query(algorithm, cursors, self.index.doc_lens, k,
                            range_size=range_size,
                            initial_threshold=initial_threshold)
        else:
            algo = ALGORITHMS[algorithm]
            q = algo(cursors, self.index.doc_lens, k, initial_threshold)
        return q.finalize()

    def run_shard(self, query: str, doc_lo: int, doc_hi: int, k: int = 10,
                  algorithm: str = "block_max_wand"
                  ) -> List[Tuple[float, int]]:
        """Top-k restricted to docids in [doc_lo, doc_hi) — the per-shard
        kernel of doc-sharded serving.  Rank-identical on merge because
        collection statistics (df, avg_len, num_docs) are global."""
        from pisa_ray.query.algorithms import _RangeBoundCursor

        term_ids, weights = self.parse_query(query)
        cursors = make_cursors(self.index, term_ids, self.scorer, weights)
        for c in cursors:
            c.next_geq(doc_lo)
        bounded = [  # type: ignore[var-annotated]
            _RangeBoundCursor(c, doc_hi) for c in cursors if not c.exhausted()]
        if not bounded:
            return []
        q = ALGORITHMS[algorithm](bounded, self.index.doc_lens, k)
        return q.finalize()

    def threshold(self, query: str, k: int = 10,
                  algorithm: str = "wand") -> float:
        """Exact k-th threshold (0 if < k results) — the ``thresholds``
        tool protocol (``/root/reference/tools/thresholds.cpp:27-55``)."""
        term_ids, _ = self.parse_query(query)
        cursors = make_cursors(self.index, term_ids, self.scorer)
        q = ALGORITHMS[algorithm](cursors, self.index.doc_lens, k)
        return q.true_threshold()

    def bool_count(self, query: str, op: str = "and") -> int:
        term_ids, _ = self.parse_query(query)
        cursors = make_cursors(self.index, term_ids, self.scorer)
        if op == "and":
            # unknown terms were dropped by parse_query (the reference's
            # TermProcessor does the same); the conjunction runs over the
            # remaining terms
            if not cursors:
                return 0
            return and_count(cursors)
        return or_count(cursors)


class QueryBatchExecutor:
    """map_batches actor: (qid, query) → (qid, rank, doc_id, score).

    The index loads once per actor (``__init__``); each ``__call__``
    serves a batch of queries — the Ray-native form of the reference's
    ``tbb::parallel_for`` over queries."""

    def __init__(self, index_dir: str, k: int = 10,
                 algorithm: str = "ranked_or_taat", **engine_kwargs):
        self.engine = QueryEngine(index_dir, **engine_kwargs)
        self.k = k
        self.algorithm = algorithm

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, text in zip(batch["qid"].to_pylist(),
                             batch["query"].to_pylist()):
            for rank, (score, doc) in enumerate(
                    self.engine.run(text, self.k, self.algorithm), 1):
                qids.append(qid)
                ranks.append(rank)
                docs.append(doc)
                scores.append(score)
        return pa.table({
            "qid": pa.array(qids, type=pa.string()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        })


def run_queries(queries, index_dir: str, *, k: int = 10,
                algorithm: str = "ranked_or_taat", concurrency: int = 4,
                batch_size: int = 16, **engine_kwargs):
    """Fan a query Dataset (or list of (qid, query)) across an actor pool.
    Returns a Dataset of (qid, rank, doc_id, score).

    ``batch_size`` controls queries-per-actor-call: small batches spread a
    modest query log across the whole pool (one giant batch would serialize
    on a single actor)."""
    import ray.data

    if not hasattr(queries, "map_batches"):
        queries = ray.data.from_items(
            [{"qid": q, "query": t} for q, t in queries])
        queries = queries.repartition(
            max(concurrency, queries.count() // max(1, batch_size)))
    return queries.map_batches(
        QueryBatchExecutor,
        fn_constructor_args=(index_dir, k, algorithm),
        fn_constructor_kwargs=engine_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class ShardExecutor:
    """map_batches actor bound to ONE doc shard: its ``__init__`` loads only
    the index segments overlapping [doc_lo, doc_hi) and that slice of the
    sizes table (``InvertedIndex(doc_range=...)``) — per-actor memory for
    postings and sizes is ∝ 1/num_shards, matching the reference's
    per-shard mmap locality (``src/sharding.cpp:146-268``)."""

    def __init__(self, index_dir: str, doc_lo: int, doc_hi: int, k: int,
                 algorithm: str):
        self.engine = QueryEngine(index_dir, doc_range=(doc_lo, doc_hi))
        self.lo, self.hi, self.k, self.algorithm = doc_lo, doc_hi, k, algorithm

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs, scores = [], [], []
        for qid, text in zip(batch["qid"].to_pylist(),
                             batch["query"].to_pylist()):
            for score, doc in self.engine.run_shard(
                    text, self.lo, self.hi, k=self.k,
                    algorithm=self.algorithm):
                qids.append(qid)
                docs.append(doc)
                scores.append(score)
        return pa.table({
            "qid": pa.array(qids, type=pa.string()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        })


def run_queries_sharded(queries, index_dir: str, *, num_shards: int = 4,
                        k: int = 10, algorithm: str = "block_max_wand",
                        concurrency: int = 4):
    """Doc-sharded query fan-out: the query log runs through one actor pool
    PER SHARD, each actor loading only its shard's docid range (segments +
    sizes slice); per-shard top-k are merged with a small groupby
    (score desc, docid asc).  Rank-identical to single-shard serving
    because the index carries global statistics — the property the
    reference's sharding relies on (SURVEY §2.12/§2.9).
    Returns a Dataset of (qid, rank, doc_id, score)."""
    import json
    import os

    import ray.data

    with open(os.path.join(index_dir, "stats.json")) as f:
        num_docs = json.load(f)["num_docs"]
    bounds = np.linspace(0, num_docs, num_shards + 1, dtype=np.int64)
    qlist = [{"qid": qid, "query": text} for qid, text in queries]
    per_shard_conc = max(1, concurrency // num_shards)
    partials = []
    for s in range(num_shards):
        ds = ray.data.from_items(qlist).repartition(
            max(per_shard_conc, len(qlist) // 8))
        partials.append(ds.map_batches(
            ShardExecutor,
            fn_constructor_args=(index_dir, int(bounds[s]),
                                 int(bounds[s + 1]), k, algorithm),
            batch_format="pyarrow", batch_size=8,
            concurrency=per_shard_conc, num_cpus=1))
    merged = partials[0]
    for p in partials[1:]:
        merged = merged.union(p)

    import pandas as pd

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "doc_id"],
                          ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1)
        return g[["qid", "rank", "doc_id", "score"]]

    return merged.groupby("qid").map_groups(merge_topk,
                                            batch_format="pandas")
