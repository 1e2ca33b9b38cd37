"""Recursive graph bisection (BP) reordering tests."""

import numpy as np
import pyarrow as pa
import pytest

from pisa_ray.index.bp import _bp_order, _csr_from_lists


def _two_cluster_corpus(n=64, seed=0):
    rng = np.random.default_rng(seed)
    doc_terms = []
    texts = []
    for d in range(n):
        base = 0 if d % 2 == 0 else 10
        ts = sorted(base + rng.choice(10, 5, replace=False))
        doc_terms.append(list(ts))
        texts.append(" ".join(f"term{t:02d}" for t in ts))
    return doc_terms, texts


def _gap_cost(doc_terms, order):
    n = len(doc_terms)
    pos = np.empty(n, dtype=np.int64)
    pos[order] = np.arange(n)
    from collections import defaultdict

    post = defaultdict(list)
    for d, ts in enumerate(doc_terms):
        for t in ts:
            post[t].append(pos[d])
    total = 0.0
    for docs in post.values():
        ds = np.sort(docs)
        gaps = np.diff(np.concatenate(([ds[0]], ds))) + 1
        total += np.log2(gaps.astype(float) + 1).sum()
    return total


def test_bp_reduces_gap_cost_and_separates_clusters():
    doc_terms, _ = _two_cluster_corpus()
    indptr, indices = _csr_from_lists(doc_terms)
    order = _bp_order(indptr, indices, np.arange(len(doc_terms)), 20,
                      iterations=20, min_partition=4, seed=1)
    assert sorted(order) == list(range(len(doc_terms)))  # a permutation
    assert _gap_cost(doc_terms, order) < _gap_cost(
        doc_terms, np.arange(len(doc_terms)))
    parity = np.array([d % 2 for d in order])
    # the interleaved clusters end up contiguous
    assert parity[:32].mean() in (0.0, 1.0)


def test_bp_end_to_end_rank_identical_and_smaller(ray_session, tmp_path):
    """BP mapping → rebuilt index: identical top-k (scores are
    order-invariant) and a smaller docid payload on a clustered corpus."""
    import os

    import ray.data

    from pisa_ray.index.bp import bp_mapping_from_fwd
    from pisa_ray.index.build import IndexConfig, build_index
    from pisa_ray.query.engine import QueryEngine

    # 16 interleaved clusters of 16 docs sharing rare cluster terms:
    # arrival order gives every term gaps of ~16; BP packs each cluster
    # contiguously (gaps ~1), so the docid payload visibly shrinks
    rng = np.random.default_rng(3)
    texts = []
    n_docs, n_clusters = 256, 16
    for d in range(n_docs):
        c = d % n_clusters
        pool = [f"term{c * 8 + j:03d}" for j in range(8)]
        texts.append(" ".join(rng.choice(pool, 5, replace=False)))
    corpus = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    base = str(tmp_path / "base")
    build_index(ray.data.from_arrow(corpus), base,
                config=IndexConfig(num_shards=1, block_size=16))
    perm = bp_mapping_from_fwd(os.path.join(base, "fwd"), iterations=10,
                               min_partition=8, ray_depth=1)
    assert sorted(perm) == list(range(len(texts)))

    reordered = corpus.set_column(
        0, "doc_id", pa.array(perm.astype(np.int64), type=pa.int64()))
    re_dir = str(tmp_path / "re")
    build_index(ray.data.from_arrow(reordered), re_dir,
                config=IndexConfig(num_shards=1, block_size=16))

    def payload_bytes(d):
        import glob

        import pyarrow.parquet as pq

        files = glob.glob(os.path.join(d, "index", "**", "*.parquet"),
                          recursive=True)
        t = pa.concat_tables([pq.read_table(f, columns=["doc_payload"])
                              for f in files])
        return sum(len(x) for x in t["doc_payload"].to_pylist())

    assert payload_bytes(re_dir) < payload_bytes(base)

    # rank-identity modulo the docid relabeling
    eng_a = QueryEngine(base)
    eng_b = QueryEngine(re_dir)
    for q in ["term003 term007", "term012 term015 term019", "term000"]:
        # top-k score vectors identical (ties at the k-boundary can pick a
        # different member of a tied group, so top-k docids aren't compared)
        ra = eng_a.run(q, k=5, algorithm="block_max_wand")
        rb = eng_b.run(q, k=5, algorithm="block_max_wand")
        assert [round(s, 4) for s, _ in ra] == [round(s, 4) for s, _ in rb]
        # FULL result sets (k = corpus size → no boundary) must be equal
        # as (score, docid) sets once ra's docids map through the perm
        fa = eng_a.run(q, k=len(texts), algorithm="ranked_or")
        fb = eng_b.run(q, k=len(texts), algorithm="ranked_or")
        assert {(round(s, 4), int(perm[d])) for s, d in fa} == \
            {(round(s, 4), d) for s, d in fb}


def test_bp_partitioned_mapping(ray_session, tmp_path):
    """Partitioned BP: block-diagonal bijection, gap cost no worse than
    identity within each block, absent docs filled, identity join for
    empty ranges."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from pisa_ray.index.bp import assign_mapping_ds, bp_mapping_partitioned

    doc_terms, _ = _two_cluster_corpus(n=48)
    # docs 10 and 47 have no tokens (absent from fwd); doc range padded
    # to 64 so the last range [32, 64) is partially filled and range
    # [48, 64) ... keep num_docs=50 -> ranges [0,32) and [32,50)
    rows_d, rows_t = [], []
    for d, ts in enumerate(doc_terms):
        if d in (10, 47):
            continue
        for t in ts:
            rows_d.append(d)
            rows_t.append(f"term{t:02d}")
    fwd = tmp_path / "fwd"
    os.makedirs(fwd)
    pq.write_table(pa.table({"doc_id": pa.array(rows_d, type=pa.int64()),
                             "term": pa.array(rows_t)}),
                   str(fwd / "part-0.parquet"))
    m = bp_mapping_partitioned(str(fwd), num_docs=50, partition_docs=32,
                               min_partition=4).to_pandas()
    assert len(m) == 50
    assert sorted(m["doc_id"]) == list(range(50))
    assert sorted(m["new_doc_id"]) == list(range(50))
    lut = dict(zip(m["doc_id"], m["new_doc_id"]))
    # block-diagonal: each doc stays in its range
    for d, nd in lut.items():
        assert (d < 32) == (nd < 32)
    # clusters separate within the first full range
    parity = [d % 2 for d in sorted(range(32), key=lambda d: lut[d])
              if d != 10]
    assert parity[:15].count(parity[0]) == 15
    # the mapping-join consumer swaps ids and identity-fills misses
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 5, 49, 1000], type=pa.int64()),
        "x": pa.array([1, 2, 3, 4], type=pa.int64())}))
    out = assign_mapping_ds(ds, bp_mapping_partitioned(
        str(fwd), num_docs=50, partition_docs=32, min_partition=4))
    odf = out.to_pandas().sort_values("x")
    assert list(odf["doc_id"])[:3] == [lut[0], lut[5], lut[49]]
    assert list(odf["doc_id"])[3] == 1000  # unseen id -> identity
