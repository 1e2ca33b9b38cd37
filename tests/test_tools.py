import numpy as np
import pyarrow as pa
import pytest

from tests.oracle import OracleIndex, make_corpus


@pytest.fixture(scope="module")
def toolbox(ray_session, tmp_path_factory):
    import ray.data

    from pisa_ray.index.build import IndexConfig, build_index
    from pisa_ray.query.engine import QueryEngine

    texts = make_corpus(60)
    out = str(tmp_path_factory.mktemp("tools"))
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    build_index(corpus, out, config=IndexConfig(num_shards=2, block_size=16))
    return QueryEngine(out), OracleIndex(texts), out


def test_count_postings(toolbox):
    from pisa_ray.tools import count_postings

    eng, oracle, _ = toolbox
    got = count_postings(eng, "thehot term001")
    want = (oracle.df[oracle.term_to_id["thehot"]]
            + oracle.df[oracle.term_to_id["term001"]])
    assert got == want
    assert count_postings(eng, "zzz") == 0


def test_selective_queries(toolbox):
    from pisa_ray.tools import selective_queries

    eng, oracle, _ = toolbox
    qs = [("rare", "term059"), ("hot", "thehot")]
    sel = selective_queries(eng, qs, max_selectivity=0.5)
    names = [q for q, _ in sel]
    assert "rare" in names and "hot" not in names


def test_compute_intersection(toolbox):
    from pisa_ray.tools import compute_intersection

    eng, oracle, _ = toolbox
    df = compute_intersection(eng, "term001 term005")
    t1, t5 = oracle.term_to_id["term001"], oracle.term_to_id["term005"]
    d1 = {d for d, _ in oracle.postings[t1]}
    d5 = {d for d, _ in oracle.postings[t5]}
    assert df["length"].iloc[0] == len(d1 & d5)
    if len(d1 & d5):
        want = max(
            float(oracle.bm25_weight(
                dict(oracle.postings[t1])[d], d, oracle.df[t1]))
            + float(oracle.bm25_weight(
                dict(oracle.postings[t5])[d], d, oracle.df[t5]))
            for d in (d1 & d5))
        assert df["max_score"].iloc[0] == pytest.approx(want, rel=1e-5)
    combos = compute_intersection(eng, "term001 term005", combinations=True)
    assert len(combos) == 3  # {t1}, {t5}, {t1,t5}


def test_extract_maxscores_and_stem(toolbox):
    from pisa_ray.tools import extract_maxscores, stem_queries

    eng, _, _ = toolbox
    ms = extract_maxscores(eng)
    assert len(ms) == eng.index.num_terms
    assert (ms["max_score"] > 0).all()
    assert stem_queries([("q1", "Running nationally")]) == [("q1", "run nation")]


def test_kth_threshold_estimate_safe(toolbox, ray_session):
    from pisa_ray.tools import kth_threshold_estimate, term_topk_scores

    eng, oracle, out = toolbox
    tt = term_topk_scores(out, k=5).to_pandas()
    term_topk = {int(r.term_id): list(r.kth_scores) for r in tt.itertuples()}
    # per-term top-k scores match brute force
    for tid, plist in list(oracle.postings.items())[:10]:
        want = sorted(
            (float(oracle.bm25_weight(tf, d, oracle.df[tid]))
             for d, tf in plist), reverse=True)[:5]
        assert term_topk[tid] == pytest.approx(want, rel=1e-5)
    df = kth_threshold_estimate(
        eng, [("q1", "thehot"), ("q2", "term001 term005"), ("q3", "zzz")],
        k=5, term_topk=term_topk)
    assert df["safe"].all()  # the estimate is a lower bound, always


def test_kth_threshold_pairs_safe_and_tighter(toolbox):
    from pisa_ray.tools import (kth_threshold_estimate,
                                kth_threshold_estimate_multi,
                                substructure_topk)

    eng, oracle, out = toolbox
    queries = [("q1", "thehot term001"), ("q2", "term001 term005 thehot"),
               ("q3", "term000"), ("q4", "zzz yyy")]
    singles = kth_threshold_estimate(eng, queries, k=5)
    multi = kth_threshold_estimate_multi(eng, queries, k=5, use_pairs=True,
                                         use_triples=True)
    # safety: every substructure estimate is a true lower bound
    assert multi["safe"].all()
    # monotonicity: adding pair/triple substructures never loosens
    assert (multi["est_threshold"].to_numpy()
            >= singles["est_threshold"].to_numpy() - 1e-9).all()
    # pair substructure top-k matches brute force on one pair
    ta = oracle.term_to_id["thehot"]
    tb = oracle.term_to_id["term001"]
    got = substructure_topk(eng, [ta, tb], k=5)
    docs_a = {d: oracle.bm25_weight(tf, d, oracle.df[ta])
              for d, tf in oracle.postings[ta]}
    docs_b = {d: oracle.bm25_weight(tf, d, oracle.df[tb])
              for d, tf in oracle.postings[tb]}
    common = sorted(set(docs_a) & set(docs_b))
    want = sorted((docs_a[d] + docs_b[d] for d in common), reverse=True)[:5]
    assert list(got) == pytest.approx(want, rel=1e-5)


def test_kth_threshold_combine(toolbox):
    """By-docid combine (kth_threshold_combine_did.cpp): safe, dominates
    max-of-kth (the shared docid pool never loosens the bound), matches a
    brute-force oracle recomputation at terms_considered=3 with a small d
    (exercising the top-d truncation), and emits the -2.0 sentinel when
    the pool can't fill k."""
    import itertools

    from pisa_ray.tools import (kth_threshold_combine,
                                kth_threshold_estimate_multi)

    eng, oracle, out = toolbox
    queries = [("q1", "thehot term001"), ("q2", "term001 term005 thehot"),
               ("q3", "term000"), ("q4", "zzz yyy")]
    k, d = 5, 10
    combine = kth_threshold_combine(eng, queries, k=k, terms_considered=3,
                                    d_mult=d // k)
    assert combine["safe"].all()
    multi = kth_threshold_estimate_multi(eng, queries, k=k, use_pairs=True,
                                         use_triples=True)
    # the pool contains every substructure's top-k docs at >= scores, so
    # the combined kth is never below any substructure's own kth
    both = combine["est_threshold"].to_numpy() >= 0
    assert (combine["est_threshold"].to_numpy()[both]
            >= multi["est_threshold"].to_numpy()[both] - 1e-9).all()

    def brute(text):
        toks = text.split()
        tids = sorted(oracle.term_to_id[t] for t in toks
                      if t in oracle.term_to_id)
        pool = {}
        for r in range(1, min(3, len(tids)) + 1):
            for sub in itertools.combinations(tids, r):
                per_doc = None
                for tid in sub:
                    m = {doc: float(oracle.bm25_weight(tf, doc,
                                                       oracle.df[tid]))
                         for doc, tf in oracle.postings[tid]}
                    per_doc = (m if per_doc is None else
                               {doc: s + m[doc]
                                for doc, s in per_doc.items() if doc in m})
                topd = sorted(per_doc.items(),
                              key=lambda kv: (-kv[1], kv[0]))[:d]
                for doc, s in topd:
                    pool[doc] = max(pool.get(doc, -np.inf), s)
        if len(pool) < k:
            return -2.0
        return sorted(pool.items(), key=lambda kv: (-kv[1], kv[0]))[k - 1][1]

    for (_, text), est in zip(queries, combine["est_threshold"]):
        want = brute(text)
        if want < 0:
            assert est == want
        else:
            assert est == pytest.approx(want, rel=1e-6)
    # q4 has no indexed terms -> empty pool -> sentinel
    assert combine["est_threshold"].iloc[3] == -2.0


def test_kth_threshold_combine_term(toolbox):
    """By-term SUM combine (kth_threshold_budget_combine_term.cpp): safe,
    dominates the single-term max-of-kth bound (positive weights make the
    per-doc sum >= any component), matches brute force."""
    from pisa_ray.tools import (kth_threshold_combine,
                                kth_threshold_estimate)

    eng, oracle, out = toolbox
    queries = [("q1", "thehot term001"), ("q2", "term001 term005 thehot"),
               ("q3", "term000")]
    k, d = 5, 10
    got = kth_threshold_combine(eng, queries, k=k, d_mult=d // k,
                                combine="sum")
    assert got["safe"].all()
    singles = kth_threshold_estimate(eng, queries, k=k)
    both = got["est_threshold"].to_numpy() >= 0
    assert (got["est_threshold"].to_numpy()[both]
            >= singles["est_threshold"].to_numpy()[both] - 1e-9).all()
    with pytest.raises(ValueError, match="combine"):
        kth_threshold_combine(eng, queries, combine="bogus")

    def brute(text):
        tids = sorted(oracle.term_to_id[t] for t in text.split()
                      if t in oracle.term_to_id)
        pool = {}
        for tid in tids:
            m = {doc: float(oracle.bm25_weight(tf, doc, oracle.df[tid]))
                 for doc, tf in oracle.postings[tid]}
            topd = sorted(m.items(), key=lambda kv: (-kv[1], kv[0]))[:d]
            for doc, s in topd:
                pool[doc] = pool.get(doc, 0.0) + s
        if len(pool) < k:
            return -2.0
        return sorted(pool.items(), key=lambda kv: (-kv[1], kv[0]))[k - 1][1]

    for (_, text), est in zip(queries, got["est_threshold"]):
        want = brute(text)
        if want < 0:
            assert est == want
        else:
            assert est == pytest.approx(want, rel=1e-6)


def test_kth_threshold_combine_slicing(toolbox):
    """Intersection-slicing combine (kth_threshold_intersection.cpp):
    safe, dominates BOTH other combiners (the all-singles slicing
    reproduces 'sum'; a subset's own slicing dominates 'max'), matches a
    brute-force partition enumeration."""
    from pisa_ray.tools import _set_partitions, kth_threshold_combine

    eng, oracle, out = toolbox
    queries = [("q1", "thehot term001"), ("q2", "term001 term005 thehot"),
               ("q3", "term000")]
    k, d = 5, 10
    slicing = kth_threshold_combine(eng, queries, k=k, terms_considered=2,
                                    d_mult=d // k, combine="slicing")
    assert slicing["safe"].all()
    for other in ("max", "sum"):
        o = kth_threshold_combine(eng, queries, k=k, terms_considered=2,
                                  d_mult=d // k, combine=other)
        both = (slicing["est_threshold"].to_numpy() >= 0) \
            & (o["est_threshold"].to_numpy() >= 0)
        assert (slicing["est_threshold"].to_numpy()[both]
                >= o["est_threshold"].to_numpy()[both] - 1e-9).all(), other

    def block_topd(tids):
        per_doc = None
        for tid in tids:
            m = {doc: float(oracle.bm25_weight(tf, doc, oracle.df[tid]))
                 for doc, tf in oracle.postings[tid]}
            per_doc = (m if per_doc is None else
                       {doc: s + m[doc]
                        for doc, s in per_doc.items() if doc in m})
        return dict(sorted(per_doc.items(),
                           key=lambda kv: (-kv[1], kv[0]))[:d])

    def brute(text):
        tids = sorted(oracle.term_to_id[t] for t in text.split()
                      if t in oracle.term_to_id)
        pool = {}
        for part in _set_partitions(tids, 2):
            sdoc = {}
            for block in part:
                for doc, s in block_topd(block).items():
                    sdoc[doc] = sdoc.get(doc, 0.0) + s
            for doc, s in sdoc.items():
                pool[doc] = max(pool.get(doc, -np.inf), s)
        if len(pool) < k:
            return -2.0
        return sorted(pool.items(), key=lambda kv: (-kv[1], kv[0]))[k - 1][1]

    for (_, text), est in zip(queries, slicing["est_threshold"]):
        want = brute(text)
        if want < 0:
            assert est == want
        else:
            assert est == pytest.approx(want, rel=1e-6)


def test_kth_threshold_combine_existence(toolbox):
    """Substructure-existence combine: safe, dominates slicing (it unions
    every slicing's revealed contributions), matches brute force."""
    import itertools

    from pisa_ray.tools import kth_threshold_combine

    eng, oracle, out = toolbox
    queries = [("q1", "thehot term001"), ("q2", "term001 term005 thehot"),
               ("q3", "term000")]
    k, d = 5, 10
    got = kth_threshold_combine(eng, queries, k=k, terms_considered=2,
                                d_mult=d // k, combine="existence")
    assert got["safe"].all()
    slicing = kth_threshold_combine(eng, queries, k=k, terms_considered=2,
                                    d_mult=d // k, combine="slicing")
    both = (got["est_threshold"].to_numpy() >= 0) \
        & (slicing["est_threshold"].to_numpy() >= 0)
    assert (got["est_threshold"].to_numpy()[both]
            >= slicing["est_threshold"].to_numpy()[both] - 1e-9).all()

    def brute(text):
        tids = sorted(oracle.term_to_id[t] for t in text.split()
                      if t in oracle.term_to_id)
        tscore = {tid: {doc: float(oracle.bm25_weight(tf, doc,
                                                      oracle.df[tid]))
                        for doc, tf in oracle.postings[tid]}
                  for tid in tids}
        revealed = set()
        for r in range(1, min(2, len(tids)) + 1):
            for sub in itertools.combinations(tids, r):
                per_doc = None
                for tid in sub:
                    m = tscore[tid]
                    per_doc = (dict(m) if per_doc is None else
                               {doc: s + m[doc]
                                for doc, s in per_doc.items() if doc in m})
                topd = sorted(per_doc.items(),
                              key=lambda kv: (-kv[1], kv[0]))[:d]
                for doc, _s in topd:
                    for tid in sub:
                        revealed.add((doc, tid))
        pool = {}
        for doc, tid in revealed:
            pool[doc] = pool.get(doc, 0.0) + tscore[tid][doc]
        if len(pool) < k:
            return -2.0
        return sorted(pool.items(), key=lambda kv: (-kv[1], kv[0]))[k - 1][1]

    for (_, text), est in zip(queries, got["est_threshold"]):
        want = brute(text)
        if want < 0:
            assert est == want
        else:
            assert est == pytest.approx(want, rel=1e-6)


def test_substructure_cache_build_and_lookup(toolbox, ray_session,
                                             tmp_path):
    """The distributed first-layer-index builder (score_generator
    capability): cached gram lists match on-the-fly computation
    bit-for-bit, persist/reload through partitioned Parquet, and feeding
    them to kth_threshold_combine (the lookup mode) reproduces the
    on-the-fly estimates exactly."""
    import itertools

    from pisa_ray.tools import (_substructure_doc_topd,
                                build_substructure_cache,
                                kth_threshold_combine,
                                load_substructure_cache)

    eng, oracle, out = toolbox
    queries = [("q1", "thehot term001"), ("q2", "term001 term005 thehot")]
    k, d_mult = 5, 2
    tids = sorted({t for _, text in queries
                   for t in eng.parse_query(text)[0]})
    grams = [(t,) for t in tids] + list(itertools.combinations(tids, 2))
    cache_ds = build_substructure_cache(
        out, grams, k=k, d_mult=d_mult,
        out_dir=str(tmp_path / "flidx"), concurrency=2)
    cache = load_substructure_cache(cache_ds)
    assert set(cache) == set(grams)
    for g in grams:
        docs, scores = _substructure_doc_topd(eng, g, k * d_mult)
        assert np.array_equal(cache[g][0], docs), g
        assert np.array_equal(cache[g][1], scores), g
    # reload from the Parquet path too, with the depth guard
    cache2 = load_substructure_cache(str(tmp_path / "flidx"),
                                     expect_d=k * d_mult)
    assert set(cache2) == set(grams)
    with pytest.raises(ValueError, match="built at d"):
        load_substructure_cache(str(tmp_path / "flidx"), expect_d=99)
    for mode in ("max", "sum", "slicing", "existence"):
        live = kth_threshold_combine(eng, queries, k=k, d_mult=d_mult,
                                     combine=mode)
        looked = kth_threshold_combine(eng, queries, k=k, d_mult=d_mult,
                                       combine=mode, cache=cache2)
        assert (live["est_threshold"].to_numpy()
                == looked["est_threshold"].to_numpy()).all(), mode
    # rebuild into the SAME out_dir (cleared, not appended) and with
    # duplicate grams in the input: loader sees no duplicated rows
    cache_ds2 = build_substructure_cache(
        out, grams + grams[:2], k=k, d_mult=d_mult,
        out_dir=str(tmp_path / "flidx"), concurrency=2)
    df2 = cache_ds2.to_pandas()
    assert not df2.duplicated(["gram", "doc_id"]).any()
    # a DEEPER cache truncates to the lookup's d -> estimates identical
    deep = build_substructure_cache(out, grams, k=k, d_mult=d_mult * 2,
                                    concurrency=2)
    deep_cache = load_substructure_cache(deep)
    for mode in ("max", "slicing"):
        live = kth_threshold_combine(eng, queries, k=k, d_mult=d_mult,
                                     combine=mode)
        looked = kth_threshold_combine(eng, queries, k=k, d_mult=d_mult,
                                       combine=mode, cache=deep_cache)
        assert (live["est_threshold"].to_numpy()
                == looked["est_threshold"].to_numpy()).all(), mode
    # a stale cache referencing docs outside the index fails LOUDLY in
    # existence mode (searchsorted would otherwise read a neighbor)
    t0 = grams[0]
    stale = dict(cache2)
    stale[t0] = (np.array([10**9], dtype=np.int64),
                 np.array([1.0]))
    with pytest.raises(ValueError, match="absent from term"):
        kth_threshold_combine(eng, queries[:1], k=k, d_mult=d_mult,
                              combine="existence", cache=stale)


def test_kth_threshold_real_world(toolbox, tmp_path):
    """Real-world harness: query-log file -> estimates + estimated-k +
    hit ratios; estimated_k matches the reference's scan semantics."""
    from pisa_ray.cli import _parse_query_file
    from pisa_ray.tools import estimated_k, kth_threshold_real_world

    eng, oracle, out = toolbox
    qf = tmp_path / "queries.txt"
    qf.write_text("q1:thehot term001\nq2:term001 term005 thehot\n"
                  "q3:term000\n")
    queries = _parse_query_file(str(qf))
    # generator input works (the harness iterates twice internally)
    df, summary = kth_threshold_real_world(eng, iter(queries), k=5,
                                           d_mult=2)
    assert list(df["qid"]) == ["q1", "q2", "q3"]
    assert df["safe"].all()
    assert summary["n"] == 3
    assert summary["safe_ratio"] == 1.0
    assert 0.0 <= summary["hit_ratio"] <= 1.0
    # a safe estimator's estimate admits rank >= k (it never overshoots
    # into the true top-(k-1))
    assert (df.loc[df["est_k"] > 0, "est_k"] >= 5).all()
    # estimated_k reference semantics on a hand case
    s = np.array([5.0, 4.0, 3.0, 2.0, 1.0])
    assert estimated_k(s, 3.5) == 3   # s[1]=4 >= 3.5 >= s[2]=3 -> i+2
    assert estimated_k(s, 5.0) == 2   # s[0] >= 5 >= s[1] -> 2
    assert estimated_k(s, 0.5) == 5   # below all -> list length
    # the distributed est_k path (serving actor pool) agrees with the
    # driver loop, including the -2 passthrough for OOV queries
    ddf, dsum = kth_threshold_real_world(eng, queries, k=5, d_mult=2,
                                         index_dir=out, concurrency=2)
    assert (ddf["est_k"].to_numpy() == df["est_k"].to_numpy()).all()
    assert dsum == summary
    # the scale path validates its preconditions loudly
    with pytest.raises(ValueError, match="duplicate qids"):
        kth_threshold_real_world(eng, queries + queries[:1], k=5,
                                 d_mult=2, index_dir=out)
    with pytest.raises(ValueError, match="string qids"):
        kth_threshold_real_world(eng, [(1, "thehot term001")], k=5,
                                 d_mult=2, index_dir=out)


def test_quantized_index(ray_session, tmp_path):
    """Quantized build: freqs hold 8-bit quantized impact scores; the
    quantized scorer reproduces a close top-k (reference: quantized index
    equivalence at epsilon, test_ranked_queries quantized variants)."""
    import ray.data

    from pisa_ray.index.build import IndexConfig, build_index
    from pisa_ray.query.engine import QueryEngine

    texts = make_corpus(60)
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    raw_dir = str(tmp_path / "raw")
    qtz_dir = str(tmp_path / "qtz")
    build_index(corpus, raw_dir, config=IndexConfig(num_shards=2))
    build_index(corpus, qtz_dir,
                config=IndexConfig(num_shards=2, quantize_bits=8))
    raw = QueryEngine(raw_dir)
    qtz = QueryEngine(qtz_dir, scorer="quantized")
    oracle = OracleIndex(texts)
    # only terms with real (non-epsilon) idf discriminate after linear
    # quantization; the synthetic corpus is stopword-heavy so pick the
    # rarest terms (df < N/2)
    rare = sorted(oracle.term_to_id.items(),
                  key=lambda kv: oracle.df[kv[1]])[:6]
    q = " ".join(t for t, _ in rare[:3])
    top_raw = [d for _, d in raw.run(q, k=10)]
    top_qtz = [d for _, d in qtz.run(q, k=10)]
    overlap = len(set(top_raw) & set(top_qtz)) / max(1, len(top_raw))
    assert overlap >= 0.7, (q, top_raw, top_qtz)
    # quantized freqs of a rare term hold multi-level impact scores
    from pisa_ray.index.reader import InvertedIndex

    qidx = InvertedIndex(qtz_dir)
    _, freqs = qidx.posting_list(qidx.term_id(rare[0][0])).decode()
    assert freqs.max() > 1


def test_reorder_random_and_mapping(ray_session, tmp_path):
    import ray.data

    from pisa_ray.index.build import IndexConfig, build_index
    from pisa_ray.index.reader import InvertedIndex
    from pisa_ray.index.reorder import assign_mapping, assign_random

    texts = ["alpha beta", "alpha gamma", "beta gamma"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    perm = assign_random(ds, seed=3).to_pandas().sort_values("text")
    assert set(perm["doc_id"]) == {0, 1, 2}
    mapped = assign_mapping(ds, {0: 2, 1: 0, 2: 1}).to_pandas()
    assert dict(zip(mapped["text"].str[:5], mapped["doc_id"]))["alpha"] in (0, 2)

    out = str(tmp_path / "ridx")
    build_index(assign_mapping(ds, {0: 2, 1: 0, 2: 1}), out,
                config=IndexConfig(num_shards=1))
    idx = InvertedIndex(out)
    docs, _ = idx.posting_list(idx.term_id("alpha")).decode()
    assert list(docs) == [0, 2]  # old docs 0,1 → new ids 2,0


def test_threshold_lookup_pipeline(toolbox):
    from pisa_ray.tools import threshold_lookup_pipeline

    eng, oracle, out = toolbox
    queries = [("q1", "thehot term001"), ("q2", "term001 term005 thehot"),
               ("q3", "term000 term004"), ("q4", "zzz")]
    df = threshold_lookup_pipeline(eng, queries, k=5, use_pairs=True)
    assert df["safe"].all()
    # a safe seed must never change the top-k
    assert df["rank_identical"].all()
    # seeding can only reduce (or equal) the scored-posting work
    assert (df["scored_seeded"] <= df["scored_cold"]).all()
    # on the multi-term queries the pair caches should actually prune
    multi = df[df["qid"].isin(["q1", "q2"])]
    assert (multi["scored_seeded"] < multi["scored_cold"]).any()


def test_map_queries(toolbox):
    from pisa_ray.tools import map_queries

    eng, oracle, out = toolbox
    df = map_queries(eng, [("q1", "thehot term001 term001"),
                           ("q2", "zzznotaword term002")])
    # duplicates deduped, unknown terms dropped
    assert list(df[df["qid"] == "q1"]["term"]) == sorted(
        ["thehot", "term001"],
        key=lambda t: eng.index.term_id(t))
    q2 = df[df["qid"] == "q2"]
    assert list(q2["term"]) == ["term002"]
    assert (df["term_id"] >= 0).all()
    # ids match the lexicon
    for _, r in df.iterrows():
        assert eng.index.term_id(r["term"]) == r["term_id"]


def test_evaluate_collection_ordering(toolbox, ray_session):
    from pisa_ray.tools import evaluate_collection_ordering

    eng, oracle, out = toolbox
    res = evaluate_collection_ordering(out)
    assert len(res) == 1
    row = res.iloc[0]
    # exact oracle: sum of bit lengths over per-term docid gap chains
    total, n = 0, 0
    for term, plist in oracle.postings.items():
        docs = sorted(d for d, _tf in plist)
        prev = None
        for d in docs:
            gap = (d + 1) if prev is None else (d - prev)
            total += int(gap).bit_length()
            prev = d
            n += 1
    assert row["num_postings"] == n
    assert row["total_bits"] == total
    assert abs(row["bits_per_posting"] - total / n) < 1e-6


def test_sampling_kprime_binomial_tail():
    from math import comb

    from pisa_ray.tools import sampling_kprime

    # k=10, s=0.5: tail over C(9,i)/512; first k' with tail <= 0.1 is 7
    assert sampling_kprime(10, 0.5, 0.1) == 7
    tail7 = sum(comb(9, i) for i in range(7, 10)) / 512
    tail6 = sum(comb(9, i) for i in range(6, 10)) / 512
    assert tail7 <= 0.1 < tail6
    # unreachable target -> conservative fallback k (never overestimates)
    assert sampling_kprime(10, 0.9, 0.01) == 10


def test_kth_threshold_simulator(toolbox):
    from pisa_ray.tools import kth_threshold_simulator

    eng, oracle, _ = toolbox
    qs = [("Q1", "thehot"), ("Q2", "thehot term007"), ("Q3", "zzznope")]
    df = kth_threshold_simulator(eng, qs, k=5, rate=0.5,
                                 target_overestimate=0.2)
    assert list(df.columns) == ["qid", "k_prime", "est_threshold",
                                "true_threshold", "safe"]
    assert (df["k_prime"] == df["k_prime"].iloc[0]).all()
    # empty query -> zero estimate, trivially safe
    assert df.loc[2, "est_threshold"] == 0.0 and bool(df.loc[2, "safe"])
    # estimate is the k'-th sampled score: recompute from the full run
    import numpy as np
    res = eng.run("thehot", k=250)
    sampled = [s for s, d in res
               if (np.uint64(d) * np.uint64(2654435761))
               % np.uint64(4294967296) < np.uint64(2147483648)]
    kp = int(df.loc[0, "k_prime"])
    want = sampled[kp - 1] if len(sampled) >= kp else 0.0
    assert df.loc[0, "est_threshold"] == want


def test_substructure_cache_guards_and_pruning(toolbox, ray_session,
                                               tmp_path):
    """Round-5 hardening: the rebuild rmtree only fires on directories
    that prove they are a prior cache; expect_d on an empty/missing cache
    raises instead of silently validating; gram_sizes prunes at the
    ``n=`` partition level."""
    import itertools
    import os

    from pisa_ray.tools import (build_substructure_cache,
                                load_substructure_cache)

    eng, oracle, out = toolbox
    tids = sorted({t for text in ("thehot term001", "term005")
                   for t in eng.parse_query(text)[0]})
    grams = [(t,) for t in tids] + list(itertools.combinations(tids, 2))
    cdir = tmp_path / "c1"
    build_substructure_cache(out, grams, k=5, d_mult=2,
                             out_dir=str(cdir), concurrency=2)
    # marker written; a rebuild into the same dir is allowed
    assert (cdir / "_pisa_ray_substructure_cache.json").exists()
    build_substructure_cache(out, grams[:2], k=5, d_mult=2,
                             out_dir=str(cdir), concurrency=2)
    # a directory that is NOT a prior cache refuses to be cleared
    precious = tmp_path / "precious"
    precious.mkdir()
    (precious / "data.parquet").write_text("not a cache")
    with pytest.raises(ValueError, match="refusing to clear"):
        build_substructure_cache(out, grams[:1], k=5, d_mult=2,
                                 out_dir=str(precious), concurrency=2)
    assert (precious / "data.parquet").exists()
    # empty cache + expect_d must raise, not silently pass the guard
    cdir2 = tmp_path / "c2"
    build_substructure_cache(out, grams, k=5, d_mult=2,
                             out_dir=str(cdir2), concurrency=2)
    with pytest.raises(ValueError, match="no n="):
        load_substructure_cache(str(cdir2), expect_d=10, gram_sizes=[7])
    # gram_sizes prunes at the read: only the requested sizes come back
    singles = load_substructure_cache(str(cdir2), expect_d=10,
                                      gram_sizes=[1])
    assert singles and all(len(g) == 1 for g in singles)
    assert os.path.isdir(str(cdir2 / "n=1"))
    full = load_substructure_cache(str(cdir2), expect_d=10)
    for g, (docs, scores) in singles.items():
        assert (full[g][0] == docs).all() and (full[g][1] == scores).all()


def test_substructure_cache_sharded_lookup(toolbox, ray_session, tmp_path):
    """ShardedSubstructureCache: shard actors hold disjoint hash slices
    whose union is the full gram set, lookups match the dict loader, and
    kth_threshold_combine through the sharded cache reproduces the
    on-the-fly estimates for every combiner."""
    import itertools

    from pisa_ray.tools import (ShardedSubstructureCache,
                                build_substructure_cache,
                                kth_threshold_combine,
                                load_substructure_cache)

    eng, oracle, out = toolbox
    queries = [("q1", "thehot term001"), ("q2", "term001 term005 thehot")]
    k, d_mult = 5, 2
    tids = sorted({t for _, text in queries
                   for t in eng.parse_query(text)[0]})
    grams = [(t,) for t in tids] + list(itertools.combinations(tids, 2))
    cdir = tmp_path / "shards"
    build_substructure_cache(out, grams, k=k, d_mult=d_mult,
                             out_dir=str(cdir), concurrency=2)
    full = load_substructure_cache(str(cdir), expect_d=k * d_mult)
    sharded = ShardedSubstructureCache(str(cdir), num_shards=3,
                                       expect_d=k * d_mult)
    assert sharded.n_grams == len(full) == len(grams)
    for g, (docs, scores) in full.items():
        got = sharded.lookup(g)
        assert got is not None, g
        assert (got[0] == docs).all() and (got[1] == scores).all()
    assert sharded.lookup((10 ** 6,)) is None  # miss -> on-the-fly
    for mode in ("max", "sum", "slicing", "existence"):
        live = kth_threshold_combine(eng, queries, k=k, d_mult=d_mult,
                                     combine=mode)
        looked = kth_threshold_combine(eng, queries, k=k, d_mult=d_mult,
                                       combine=mode, cache=sharded)
        assert (live["est_threshold"].to_numpy()
                == looked["est_threshold"].to_numpy()).all(), mode
    # depth guard works through the sharded path too (constructors
    # that raise clean up their actors)
    with pytest.raises(ValueError, match="built at d"):
        ShardedSubstructureCache(str(cdir), num_shards=2, expect_d=99)
    with pytest.raises(ValueError, match="EMPTY"):
        ShardedSubstructureCache(str(cdir), num_shards=2, expect_d=99,
                                 gram_sizes=[9])
    sharded.shutdown()


def test_slicing_term_cap(toolbox):
    """combine='slicing' degrades to the -2.0 sentinel past
    slicing_max_terms (the reference tabulates only 2-5 terms); below the
    cap estimates are unchanged."""
    from pisa_ray.tools import kth_threshold_combine

    eng, oracle, _ = toolbox
    long_q = [("q1", "thehot term001 term005 term007")]  # 4 distinct terms
    capped = kth_threshold_combine(eng, long_q, k=5, d_mult=2,
                                   combine="slicing", slicing_max_terms=3)
    assert capped["est_threshold"].iloc[0] == -2.0
    assert capped["safe"].all()
    uncapped = kth_threshold_combine(eng, long_q, k=5, d_mult=2,
                                     combine="slicing")
    assert uncapped["est_threshold"].iloc[0] > 0


def test_real_world_distributed_estimate_pass_1k(toolbox, ray_session):
    """Round-4 verdict task #2: the combine-ESTIMATE pass of the
    real-world harness is distributed when index_dir is given; pinned
    bit-identical to the driver loop on a 1k-query log (estimates,
    est_k, and summary)."""
    from pisa_ray.tools import (kth_threshold_combine,
                                kth_threshold_combine_distributed,
                                kth_threshold_real_world)

    eng, oracle, out = toolbox
    rng = np.random.default_rng(42)
    vocab = [f"term{i:03d}" for i in range(60)] + ["thehot", "zzznope"]
    queries = [
        (f"q{i:04d}", " ".join(rng.choice(vocab,
                                          size=int(rng.integers(1, 5)))))
        for i in range(1000)
    ]
    dist = kth_threshold_combine_distributed(out, queries, k=3, d_mult=2,
                                             combine="max", concurrency=2)
    drv = kth_threshold_combine(eng, queries, k=3, d_mult=2, combine="max")
    assert list(dist["qid"]) == [q for q, _t in queries]
    assert (dist["est_threshold"].to_numpy()
            == drv["est_threshold"].to_numpy()).all()
    assert (dist["true_threshold"].to_numpy()
            == drv["true_threshold"].to_numpy()).all()
    # full harness: driver vs distributed identical end-to-end (bounded
    # result_mult keeps the probe pass cheap on the tiny fixture)
    sub = queries[:200]
    ddf, dsum = kth_threshold_real_world(eng, sub, k=3, d_mult=2,
                                         combine="max", result_mult=10,
                                         index_dir=out, concurrency=2)
    vdf, vsum = kth_threshold_real_world(eng, sub, k=3, d_mult=2,
                                         combine="max", result_mult=10)
    assert (ddf["est_threshold"].to_numpy()
            == vdf["est_threshold"].to_numpy()).all()
    assert (ddf["est_k"].to_numpy() == vdf["est_k"].to_numpy()).all()
    assert dsum == vsum


def test_substructure_cache_wire_roundtrip(toolbox, ray_session, tmp_path):
    """The C++ fork's binary prefix-file wire format
    (kth_threshold_combine_did_new.cpp:380-425): export -> import -> the
    imported cache is byte-stable (re-export identical), estimates from
    it are deterministic across import passes, and floor quantization
    keeps every combiner SAFE."""
    import itertools
    import os

    from pisa_ray.tools import (build_substructure_cache,
                                export_substructure_cache_wire,
                                import_substructure_cache_wire,
                                kth_threshold_combine,
                                load_substructure_cache)

    eng, oracle, out = toolbox
    queries = [("q1", "thehot term001"), ("q2", "term001 term005 thehot")]
    k, d_mult = 5, 2
    tids = sorted({t for _, text in queries
                   for t in eng.parse_query(text)[0]})
    grams = [(t,) for t in tids] + list(itertools.combinations(tids, 2))
    cds = build_substructure_cache(out, grams, k=k, d_mult=d_mult,
                                   concurrency=2)
    cache = load_substructure_cache(cds)
    w1 = tmp_path / "wire1"
    man = export_substructure_cache_wire(eng, cache, str(w1))
    assert man["n_grams"] == len(grams) and man["sizes"] == [1, 2]
    # reader-visible layout: prefix binary + lexicon offsets + gram list
    assert (w1 / "n1_prefix").exists() and (w1 / "n2_lexicon.txt").exists()
    imp1 = import_substructure_cache_wire(str(w1))
    assert set(imp1) == set(cache)
    for g in grams:
        # docid lists and ORDER survive the round trip exactly
        assert np.array_equal(imp1[g][0], cache[g][0]), g
        # floor quantization: reconstructed scores never exceed the truth
        assert (imp1[g][1] <= cache[g][1] + 1e-9).all(), g
    # idempotent: export(import(export(x))) is byte-identical
    w2 = tmp_path / "wire2"
    export_substructure_cache_wire(eng, cache, str(w2),
                                   scale=man["scale"])
    for n in (1, 2):
        b1 = (w1 / f"n{n}_prefix").read_bytes()
        b2 = (w2 / f"n{n}_prefix").read_bytes()
        assert b1 == b2
        assert ((w1 / f"n{n}_lexicon.txt").read_text()
                == (w2 / f"n{n}_lexicon.txt").read_text())
    imp2 = import_substructure_cache_wire(str(w2))
    # estimates from the imported (quantized) cache: deterministic across
    # import passes and SAFE for every combiner
    for mode in ("max", "sum", "slicing", "existence"):
        a = kth_threshold_combine(eng, queries, k=k, d_mult=d_mult,
                                  combine=mode, cache=imp1)
        b = kth_threshold_combine(eng, queries, k=k, d_mult=d_mult,
                                  combine=mode, cache=imp2)
        assert (a["est_threshold"].to_numpy()
                == b["est_threshold"].to_numpy()).all(), mode
        assert a["safe"].all(), mode
    # a fork-written cache has no manifest: scale is then required
    os.remove(str(w2 / "_pisa_ray_wire_manifest.json"))
    with pytest.raises(ValueError, match="pass scale"):
        import_substructure_cache_wire(str(w2))
    imp3 = import_substructure_cache_wire(str(w2), scale=man["scale"])
    assert set(imp3) == set(imp1)
