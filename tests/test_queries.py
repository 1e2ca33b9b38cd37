import numpy as np
import pyarrow as pa
import pytest

from tests.oracle import OracleIndex, make_corpus

QUERIES = [
    ("q_single", "term000"),
    ("q_rare", "term059"),
    ("q_hot", "thehot"),
    ("q_two", "term001 term005"),
    ("q_hot_mix", "thehot term003 term010"),
    ("q_abbrev", "U.S.A. dog's"),
    ("q_unknown", "term001 zzzznotaword"),
    ("q_all_unknown", "zzzz yyyy"),
    ("q_dupes", "term002 term002 term007"),
    ("q_five", "term000 term004 term009 term020 term040"),
]


@pytest.fixture(scope="module")
def engine(ray_session, tmp_path_factory):
    import ray.data

    from pisa_ray.index.build import IndexConfig, build_index
    from pisa_ray.query.engine import QueryEngine

    texts = make_corpus()
    out_dir = str(tmp_path_factory.mktemp("qidx"))
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    build_index(corpus, out_dir, config=IndexConfig(num_shards=2, block_size=16))
    return QueryEngine(out_dir), OracleIndex(texts), out_dir


def assert_topk_equivalent(got, want, context=""):
    """Rank-identity modulo equal-score permutations (the reference's own
    equivalence criterion, test_ranked_queries.cpp:18-146)."""
    assert len(got) == len(want), f"{context}: lengths {len(got)} != {len(want)}"
    for (gs, gd), (ws, wd) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-5, abs=1e-6), context
    # group by rounded score → same docid sets
    def groups(items):
        g = {}
        for s, d in items:
            g.setdefault(round(s, 4), set()).add(d)
        return g
    gg, wg = groups(got), groups(want)
    assert set(gg) == set(wg), context
    for key in gg:
        # boundary tie-groups may be truncated differently; require one to
        # contain the other only when sizes differ
        assert gg[key] == wg[key] or gg[key] <= wg[key] or wg[key] <= gg[key], context


@pytest.mark.parametrize("k", [5, 10, 100])
def test_ranked_or_matches_oracle(engine, k):
    eng, oracle, _ = engine
    for qid, text in QUERIES:
        got = eng.run(text, k=k, algorithm="ranked_or")
        want = oracle.topk(text, k=k)
        assert_topk_equivalent(got, want, f"{qid} k={k}")


@pytest.mark.parametrize("algorithm", ["ranked_or_taat", "ranked_and", "wand",
                                       "block_max_wand", "maxscore"])
@pytest.mark.parametrize("k", [5, 10])
def test_pruning_matches_exhaustive(engine, algorithm, k):
    eng, oracle, _ = engine
    for qid, text in QUERIES:
        got = eng.run(text, k=k, algorithm=algorithm)
        if algorithm == "ranked_and":
            # conjunction semantics: oracle = docs containing ALL terms
            term_ids, _ = eng.parse_query(text)
            want_all = oracle.topk(text, k=10**6)
            present = [t for t in oracle.analyzer.analyze(text)
                       if t in oracle.term_to_id]
            if len(set(present)) != len(set(
                    oracle.analyzer.analyze(text))):
                continue  # unknown term → empty conjunction, checked below
            need = {oracle.term_to_id[t] for t in present}
            docs_all = [
                (s, d) for s, d in want_all
                if all(any(dd == d for dd, _ in oracle.postings[t]) for t in need)
            ]
            want = docs_all[:k]
            if not need:
                want = []
        else:
            want = oracle.topk(text, k=k)
        assert_topk_equivalent(got, want, f"{qid} {algorithm} k={k}")


def test_thresholds(engine):
    eng, oracle, _ = engine
    for qid, text in QUERIES:
        got = eng.threshold(text, k=5)
        want = oracle.threshold(text, k=5)
        assert got == pytest.approx(want, rel=1e-5, abs=1e-6), qid


def test_bool_counts(engine):
    eng, oracle, _ = engine
    for qid, text in QUERIES:
        assert eng.bool_count(text, "and") == oracle.bool_and(text), qid
        assert eng.bool_count(text, "or") == oracle.bool_or(text), qid


def test_weighted_query(engine):
    eng, oracle, _ = engine
    # duplicated term scores double: weighted "t t" == 2 * single-term score
    single = eng.run("term002", k=5, algorithm="ranked_or")
    double = eng.run("term002 term002", k=5, algorithm="ranked_or",
                     weighted=True)
    assert len(single) == len(double)
    for (s1, d1), (s2, d2) in zip(single, double):
        assert d1 == d2
        assert s2 == pytest.approx(2 * s1, rel=1e-6)


def test_run_queries_actor_pool(engine, ray_session):
    from pisa_ray.query.engine import run_queries

    eng, oracle, out_dir = engine
    res = run_queries(QUERIES, out_dir, k=10, algorithm="ranked_or_taat",
                      concurrency=2).to_pandas()
    assert set(res["qid"]) == {q for q, t in QUERIES if oracle.topk(t, 10)}
    for qid, text in QUERIES:
        sub = res[res["qid"] == qid].sort_values("rank")
        want = oracle.topk(text, k=10)
        assert_topk_equivalent(
            list(zip(sub["score"], sub["doc_id"])), want, qid)


@pytest.mark.parametrize("algorithm", ["block_max_maxscore",
                                       "block_max_ranked_and"])
def test_new_pruning_algorithms(engine, algorithm):
    eng, oracle, _ = engine
    for qid, text in QUERIES:
        got = eng.run(text, k=10, algorithm=algorithm)
        if algorithm == "block_max_ranked_and":
            want = eng.run(text, k=10, algorithm="ranked_and")
        else:
            want = oracle.topk(text, k=10)
        assert_topk_equivalent(got, want, f"{qid} {algorithm}")


@pytest.mark.parametrize("algorithm", ["ranked_or", "wand", "block_max_wand",
                                       "maxscore"])
def test_range_query_rank_identical(engine, algorithm):
    eng, oracle, _ = engine
    for qid, text in QUERIES:
        got = eng.run(text, k=10, algorithm=algorithm, range_size=16)
        want = oracle.topk(text, k=10)
        assert_topk_equivalent(got, want, f"{qid} range:{algorithm}")


def test_sharded_serving_rank_identical(engine, ray_session):
    from pisa_ray.query.engine import run_queries_sharded

    eng, oracle, out_dir = engine
    res = run_queries_sharded(QUERIES, out_dir, num_shards=3, k=10,
                              concurrency=2).to_pandas()
    for qid, text in QUERIES:
        want = oracle.topk(text, k=10)
        sub = res[res["qid"] == qid].sort_values("rank")
        assert_topk_equivalent(list(zip(sub["score"], sub["doc_id"])),
                               want, f"{qid} sharded")


def test_doc_range_reader_loads_fraction(ray_session, tmp_path):
    """A doc_range-restricted reader holds a fraction of the postings and
    exactly its slice of the sizes table — sharded serving is actually
    sharded.  Needs a salted partition index (doc-range-scoped segment
    files) for the first_doc/last_doc pruning to bite."""
    import ray.data

    from pisa_ray.index.build import IndexConfig, build_index
    from pisa_ray.index.reader import InvertedIndex

    texts = make_corpus(120)
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    out_dir = str(tmp_path / "shardidx")
    build_index(corpus, out_dir,
                config=IndexConfig(num_shards=2, exchange="partition",
                                   exchange_rows_per_part=200))
    full = InvertedIndex(out_dir)
    total_postings = sum(
        sum(s.n for s in segs) for segs in full._segments.values())
    num_docs = full.stats.num_docs
    lo, hi = 0, num_docs // 3
    part = InvertedIndex(out_dir, doc_range=(lo, hi))
    part_postings = sum(
        sum(s.n for s in segs) for segs in part._segments.values())
    # segments overlap range boundaries, so allow slack over the exact 1/3
    assert part_postings < 0.8 * total_postings
    assert len(part.doc_lens.arr) == hi - lo
    # doc lengths agree on the loaded range (vectorized lookup path)
    ids = np.arange(lo, hi, dtype=np.int64)
    assert (part.doc_lens[ids] == full.doc_lens[ids]).all()


@pytest.mark.parametrize("wand_cfg", [{"wand_block_size": 8},
                                      {"wand_lambda": 0.3}])
def test_decoupled_wand_blocks_rank_identical(ray_session, tmp_path,
                                              wand_cfg):
    """Fixed-other-size and variable (SIGIR'17) wand partitions keep every
    block-max algorithm rank-identical (bounds stay upper bounds)."""
    import ray.data

    from pisa_ray.index.build import IndexConfig, build_index
    from pisa_ray.query.engine import QueryEngine

    texts = make_corpus(60)
    oracle = OracleIndex(texts)
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    out = str(tmp_path / "widx")
    build_index(corpus, out, config=IndexConfig(
        num_shards=2, block_size=16, **wand_cfg))
    eng = QueryEngine(out)
    for qid, text in QUERIES:
        for algo in ("block_max_wand", "block_max_maxscore"):
            got = eng.run(text, k=10, algorithm=algo)
            want = oracle.topk(text, k=10)
            assert_topk_equivalent(got, want, f"{qid} {algo} {wand_cfg}")
    # variable partition actually differs from the codec partition
    from pisa_ray.index.reader import InvertedIndex

    idx = InvertedIndex(out)
    hot = idx.term_id("thehot")
    seg = idx.posting_list(hot).segments[0]
    assert len(seg.wand_last_docs) != 0


@pytest.mark.parametrize("k", [3, 10, 50])
def test_taat_maxscore_rank_identical(engine, k):
    eng, oracle, _ = engine
    for qid, text in QUERIES:
        got = eng.run(text, k=k, algorithm="taat_maxscore")
        want = oracle.topk(text, k=k)
        assert_topk_equivalent(got, want, f"{qid} taat_maxscore k={k}")


@pytest.mark.parametrize("k", [3, 10, 50])
def test_block_max_taat_rank_identical(engine, k):
    eng, oracle, _ = engine
    for qid, text in QUERIES:
        got = eng.run(text, k=k, algorithm="block_max_taat")
        want = oracle.topk(text, k=k)
        assert_topk_equivalent(got, want, f"{qid} block_max_taat k={k}")


def test_block_max_taat_arrays_random():
    """Kernel-level fuzz vs a brute-force accumulator, including ties,
    small ranges (range_bits=4 → many ranges + skips), weights and an
    initial threshold."""
    import numpy as np

    from pisa_ray.query.algorithms import block_max_taat_arrays

    rng = np.random.default_rng(5)
    n = 1000
    for trial in range(25):
        m = rng.integers(1, 5)
        lists = []
        dense = np.zeros(n, dtype=np.float32)
        for _ in range(m):
            sz = int(rng.integers(1, 400))
            docs = np.sort(rng.choice(n, size=sz, replace=False)).astype(np.int64)
            # quantized scores → frequent exact ties
            scores = (rng.integers(1, 8, size=sz) * 0.25).astype(np.float32)
            w = float(rng.choice([1.0, 2.0]))
            lists.append((docs, scores, float(scores.max()), w))
            dense[docs] += scores * np.float32(w)
        k = int(rng.integers(1, 20))
        q = block_max_taat_arrays(lists, n, k, range_bits=4)
        got = q.finalize()
        cand = np.flatnonzero(dense > 0)
        order = np.lexsort((cand, -dense[cand].astype(np.float64)))[:k]
        want = [(float(dense[cand[o]]), int(cand[o])) for o in order]
        assert [(round(s, 5), d) for s, d in got] == \
            [(round(s, 5), d) for s, d in want], f"trial {trial}"
